"""Base class for per-node constraints.

Parity: reference ``raocp/core/constraints/base_constraint.py:4``. Constraint
matrices (Gamma_x, Gamma_u) act on the stacked ``[x; u]`` (nonleaf) or ``x``
(leaf) vector; the solver applies the constraint by projecting the matching
dual segment. Sizes are injected by the problem builder from the dynamics
shapes.
"""

import numpy as np

__all__ = ["Constraint"]


class Constraint:
    def __init__(self, node_type):
        self.__node_type = node_type
        self.__state_size = None
        self.__control_size = None
        self.__state_matrix = None
        self.__control_matrix = None
        self.__state_matrix_transposed = None
        self.__control_matrix_transposed = None

    def project(self, vector):
        """Project onto the constraint set (overridden by subclasses)."""

    # -- getters -----------------------------------------------------------

    @property
    def is_active(self):
        raise Exception(
            "Base constraint accessed - actual constraint must not be setup")

    @property
    def node_type(self):
        return self.__node_type

    @property
    def state_size(self):
        return self.__state_size

    @property
    def control_size(self):
        return self.__control_size

    @property
    def state_matrix(self):
        return self.__state_matrix

    @property
    def control_matrix(self):
        return self.__control_matrix

    @property
    def state_matrix_transposed(self):
        if self.__state_matrix_transposed is None:
            raise Exception("Constraint state matrix transpose called but is None")
        return self.__state_matrix_transposed

    @property
    def control_matrix_transposed(self):
        if self.__control_matrix_transposed is None:
            raise Exception("Constraint control matrix transpose called but is None")
        return self.__control_matrix_transposed

    # -- setters (sizes injected by the builder) ----------------------------

    @state_size.setter
    def state_size(self, size):
        self.__state_size = size
        if self.__node_type.is_nonleaf:
            if self.__control_size is not None:
                self._set_matrices()
                self._get_transpose()
        elif self.__node_type.is_leaf:
            self.__control_size = 0
            self._set_matrices()
            self._get_transpose()
        else:
            raise Exception("Node type missing")

    @control_size.setter
    def control_size(self, size):
        if self.__node_type.is_leaf:
            raise Exception("Attempt to set control size on leaf node")
        if not self.__node_type.is_nonleaf:
            raise Exception("Node type missing")
        self.__control_size = size
        if self.__state_size is not None:
            self._set_matrices()
            self._get_transpose()

    def _set_matrices(self):
        pass

    def _get_transpose(self):
        self.__state_matrix_transposed = np.transpose(self.state_matrix)
        if self.__node_type.is_nonleaf:
            self.__control_matrix_transposed = np.transpose(self.control_matrix)

    @state_matrix.setter
    def state_matrix(self, matrix):
        self.__state_matrix = matrix

    @control_matrix.setter
    def control_matrix(self, matrix):
        if self.__node_type.is_leaf:
            raise Exception("Attempt to set control constraint matrix of leaf node")
        if not self.__node_type.is_nonleaf:
            raise Exception("Node type missing")
        self.__control_matrix = matrix

    def __str__(self):
        return "Base constraint"

    def __repr__(self):
        return "Base constraint"
