"""Coherent risk measures via conic ambiguity sets.

Parity: reference ``raocp/core/risks.py:5``. A risk measure is represented by
the conic tuple ``(E, F, cone, b)`` of its ambiguity set
``{mu : E mu + F nu <=_cone b}``; the solver consumes the padded, stacked
forms built in :mod:`raocp_tpu.core.stacked`.
"""

import numpy as np

import raocp_tpu.core.constraints.cones as core_cones

__all__ = ["AVaR"]


class AVaR:
    """Average Value at Risk at level alpha.

    The ambiguity set of AVaR_alpha with ``c`` children and conditional child
    probabilities ``pi`` is ``{mu : E mu <=_K b}`` with
    ``E = [alpha*I; -I; 1^T]``, ``F = 0`` (width 0),
    ``K = NonnegativeOrthant(2c) x Zero(1)`` and ``b = [pi; 0; 1]``
    (parity: reference ``risks.py:28-35``).
    """

    def __init__(self, alpha):
        if not (0 <= alpha <= 1):
            raise ValueError("alpha value '%d' not supported" % alpha)
        self.__alpha = alpha
        self.__num_children = None
        self.__children_probabilities = None
        self.__matrix_e = None
        self.__matrix_f = None
        self.__cone = None
        self.__vector_b = None

    def _make_e_f_cone_b(self) -> None:
        c = self.__num_children
        eye = np.eye(c)
        self.__matrix_e = np.vstack((self.__alpha * eye, -eye,
                                     np.ones((1, c))))
        self.__matrix_f = np.zeros((2 * c + 1, 0))
        self.__cone = core_cones.Cartesian(
            [core_cones.NonnegativeOrthant(dimension=2 * c),
             core_cones.Zero(dimension=1)])
        self.__vector_b = np.vstack(
            (np.asarray(self.__children_probabilities).reshape(-1, 1),
             np.zeros((c, 1)), [[1.0]]))

    @property
    def is_risk(self) -> bool:
        return True

    @property
    def alpha(self):
        """AVaR risk level alpha."""
        return self.__alpha

    @property
    def matrix_e(self):
        """Ambiguity set matrix E."""
        return self.__matrix_e

    @property
    def matrix_f(self):
        """Ambiguity set matrix F."""
        return self.__matrix_f

    @property
    def cone(self):
        """Ambiguity set cone K."""
        return self.__cone

    @property
    def vector_b(self):
        """Ambiguity set vector b."""
        return self.__vector_b

    @property
    def probs(self):
        return self.__children_probabilities

    @probs.setter
    def probs(self, vector) -> None:
        vector = np.asarray(vector, dtype=np.float64)
        self.__children_probabilities = vector
        self.__num_children = vector.size
        self._make_e_f_cone_b()

    def __str__(self) -> str:
        return (f"Risk item; type: {type(self).__name__}, "
                f"alpha: {self.__alpha}; cone: {self.__cone.types}")

    def __repr__(self) -> str:
        return self.__str__()
