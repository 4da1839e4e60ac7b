"""Linear dynamics item ``x+ = A x + B u``.

Parity: reference ``raocp/core/dynamics.py:3``.
"""

import numpy as np

__all__ = ["Dynamics"]


class Dynamics:
    """A pair of state (A) and control (B) dynamics matrices."""

    def __init__(self, state_dynamics, control_dynamics):
        state_dynamics = np.asarray(state_dynamics, dtype=np.float64)
        control_dynamics = np.asarray(control_dynamics, dtype=np.float64)
        if state_dynamics.shape[0] != control_dynamics.shape[0]:
            raise ValueError("Dynamics matrices rows are different sizes")
        self.__state_dynamics = state_dynamics
        self.__control_dynamics = control_dynamics

    @property
    def state_dynamics(self) -> np.ndarray:
        return self.__state_dynamics

    @property
    def control_dynamics(self) -> np.ndarray:
        return self.__control_dynamics
