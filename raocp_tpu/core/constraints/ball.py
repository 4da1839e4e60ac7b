"""Euclidean-ball (second-order-cone slice) constraint on ``[x; u]`` / ``x``.

``||v - center||_2 <= radius`` — the norm-ball state-input constraint of
BASELINE config 3 ("SOC state-input constraints"): the set is the radius-
``radius`` slice of the second-order cone shifted to ``center``. The
reference only ships Rectangle/No constraints (its ``raocp/core/
constraints/`` has no norm constraint); this is a new capability, wired
through the same dual-segment projection path as Rectangle. On device the
projection is one fused norm + rescale over all nodes
(:func:`raocp_tpu.ops.cones.ball_project`).
"""

import numpy as np

from raocp_tpu.core.constraints.base import Constraint

__all__ = ["Ball"]


class Ball(Constraint):
    """Euclidean-norm ball ``||v - center|| <= radius``.

    ``center=None`` means the origin (resolved to the constrained vector's
    size when the builder injects state/control sizes)."""

    def __init__(self, node_type, radius, center=None):
        super().__init__(node_type)
        radius = float(radius)
        if not radius > 0:
            raise Exception("Ball constraint - radius must be positive")
        self.__radius = radius
        self.__center = (None if center is None
                         else np.asarray(center, dtype=np.float64).reshape(-1))

    @property
    def is_active(self) -> bool:
        return True

    @property
    def radius(self) -> float:
        return self.__radius

    @property
    def center(self):
        return self.__center

    def center_for_size(self, size: int) -> np.ndarray:
        if self.__center is None:
            return np.zeros(size)
        if self.__center.size != size:
            raise Exception(
                f"Ball constraint - center has {self.__center.size} entries, "
                f"constrained vector has {size}")
        return self.__center

    def _set_matrices(self):
        n, m = self.state_size, self.control_size
        self.state_matrix = np.vstack((np.eye(n), np.zeros((m, n))))
        if self.node_type.is_nonleaf:
            self.control_matrix = np.vstack((np.zeros((n, m)), np.eye(m)))

    def project(self, vector):
        flat = np.asarray(vector, dtype=np.float64).reshape(-1)
        c = self.center_for_size(flat.size)
        dv = flat - c
        norm = float(np.linalg.norm(dv))
        if norm <= self.__radius:
            return np.asarray(vector, dtype=np.float64)
        return (c + dv * (self.__radius / norm)).reshape(np.shape(vector))
