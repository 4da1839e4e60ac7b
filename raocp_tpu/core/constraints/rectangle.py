"""Rectangle (box) constraint on the stacked ``[x; u]`` or ``x`` vector.

Parity: reference ``raocp/core/constraints/rectangle.py:5``. The constraint
matrices are stacked identities, so the solver never materialises them on
device — the batched path projects with a single clip
(:func:`raocp_tpu.ops.cones.box_project`). ``None`` bounds are mapped to
+/- infinity.
"""

import numpy as np

from raocp_tpu.core.constraints.base import Constraint

__all__ = ["Rectangle"]


def _to_inf(vector) -> np.ndarray:
    """Replace None entries with +/- inf and return a float column vector."""
    flat = np.asarray(vector, dtype=object).reshape(-1)
    out = np.array([np.nan if v is None else float(v) for v in flat],
                   dtype=np.float64)
    return out


class Rectangle(Constraint):
    """Box constraint ``min <= v <= max`` (entries may be None = unbounded)."""

    def __init__(self, node_type, _min, _max):
        super().__init__(node_type)
        self._check_constraints(_min, _max)
        lo = _to_inf(_min)
        hi = _to_inf(_max)
        self.__min = np.where(np.isnan(lo), -np.inf, lo)
        self.__max = np.where(np.isnan(hi), np.inf, hi)

    @property
    def is_active(self) -> bool:
        return True

    @property
    def min(self) -> np.ndarray:
        return self.__min

    @property
    def max(self) -> np.ndarray:
        return self.__max

    def _set_matrices(self):
        n, m = self.state_size, self.control_size
        self.state_matrix = np.vstack((np.eye(n), np.zeros((m, n))))
        if self.node_type.is_nonleaf:
            self.control_matrix = np.vstack((np.zeros((n, m)), np.eye(m)))

    def project(self, vector):
        self._check_input(vector)
        flat = np.asarray(vector, dtype=np.float64).reshape(-1)
        return np.clip(flat, self.__min, self.__max).reshape(np.shape(vector))

    @staticmethod
    def _check_constraints(_min, _max) -> None:
        _min = np.asarray(_min, dtype=object).reshape(-1)
        _max = np.asarray(_max, dtype=object).reshape(-1)
        if _min.size != _max.size:
            raise Exception(
                "Rectangle constraint - min and max vectors sizes are not equal")
        for lo, hi in zip(_min, _max):
            if lo is None and hi is None:
                raise Exception(
                    "Rectangle constraint - both min and max constraints "
                    "cannot be None")
            if lo is not None and hi is not None and lo > hi:
                raise Exception("Rectangle constraint - min greater than max")

    def _check_input(self, vector) -> None:
        if np.size(vector) != self.state_matrix.shape[0]:
            raise Exception(
                "Rectangle constraint - input vector does not equal expected size")

    def __str__(self):
        return f"Constraint; type: {type(self).__name__}"

    def __repr__(self):
        return f"Constraint; type: {type(self).__name__}"
