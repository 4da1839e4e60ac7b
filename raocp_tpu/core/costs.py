"""Quadratic stage-cost item.

Parity: reference ``raocp/core/costs.py:4``. The solver only consumes the
matrix square roots (they appear in the L operator's SOC rows), so they are
computed once here at build time on the host.
"""

import numpy as np
from scipy.linalg import sqrtm

__all__ = ["Quadratic"]


class Quadratic:
    """A quadratic cost item for any node: x'Qx (+ u'Ru on nonleaf nodes)."""

    def __init__(self, node_type, state_weights, control_weights=None):
        """
        :param node_type: :class:`Nonleaf` or :class:`Leaf` tag
        :param state_weights: state cost matrix Q (or terminal P on leaves)
        :param control_weights: control cost matrix R (nonleaf only)
        """
        self.__node_type = node_type
        self._check_control_weights(control_weights)
        state_weights = np.asarray(state_weights, dtype=np.float64)
        if state_weights.shape[0] != state_weights.shape[1]:
            raise Exception("Quadratic cost state weight matrix is not square")
        self.__state_weights = state_weights
        self.__sqrt_state_weights = np.real(sqrtm(state_weights))
        self.__control_weights = None
        self.__sqrt_control_weights = None
        if node_type.is_nonleaf:
            control_weights = np.asarray(control_weights, dtype=np.float64)
            if control_weights.shape[0] != control_weights.shape[1]:
                raise Exception(
                    "Quadratic cost control weight matrix is not square")
            self.__control_weights = control_weights
            self.__sqrt_control_weights = np.real(sqrtm(control_weights))
        elif not node_type.is_leaf:
            raise Exception("Control weights error in cost")

    def _check_control_weights(self, weights) -> None:
        if self.__node_type.is_nonleaf and weights is None:
            raise Exception("No control weights provided for a nonleaf node")
        if self.__node_type.is_leaf and weights is not None:
            raise Exception("Control weights provided for a leaf node")

    @property
    def node_type(self):
        return self.__node_type

    @property
    def state_weights(self) -> np.ndarray:
        return self.__state_weights

    @property
    def control_weights(self):
        return self.__control_weights

    @property
    def sqrt_state_weights(self) -> np.ndarray:
        return self.__sqrt_state_weights

    @property
    def sqrt_control_weights(self):
        return self.__sqrt_control_weights

    def __str__(self) -> str:
        return f"Cost item; type: {type(self).__name__}"

    def __repr__(self) -> str:
        return f"Cost item; type: {type(self).__name__}"
