"""The inactive (absent) constraint.

Parity: reference ``raocp/core/constraints/no_constraint.py:4``.
"""

from raocp_tpu.core.constraints.base import Constraint

__all__ = ["No"]


class No(Constraint):
    """Placeholder for nodes without constraints (``is_active`` is False)."""

    def __init__(self, node_type=None):
        super().__init__(node_type)

    @property
    def is_active(self) -> bool:
        return False
