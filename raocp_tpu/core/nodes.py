"""Node-type tags used to specialise costs and constraints.

Parity: reference ``raocp/core/nodes.py:3,16,25``.
"""

__all__ = ["Node", "Nonleaf", "Leaf"]


class Node:
    """Base tag; neither nonleaf nor leaf."""

    @property
    def is_nonleaf(self) -> bool:
        return False

    @property
    def is_leaf(self) -> bool:
        return False


class Nonleaf(Node):
    """Tag for nonleaf (internal) nodes."""

    @property
    def is_nonleaf(self) -> bool:
        return True


class Leaf(Node):
    """Tag for leaf (terminal) nodes."""

    @property
    def is_leaf(self) -> bool:
        return True
