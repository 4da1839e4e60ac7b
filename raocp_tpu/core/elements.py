"""Problem elements: node kinds, linear dynamics, quadratic costs, AVaR risk.

Capability parity with the reference's element layer (``raocp/core/nodes.py``,
``dynamics.py``, ``costs.py``, ``risks.py``), redesigned for the TPU build:
an element is an immutable declarative *value* (enum / frozen dataclass),
and anything derived from it — matrix square roots, the conic form of a risk
ambiguity set — is produced by a pure realization function at build time.
The builder (:mod:`raocp_tpu.core.spec`) stores one instance per distinct
element and an index per node; the stacking pass
(:mod:`raocp_tpu.core.stacked`) turns realized elements into padded device
arrays.
"""

import dataclasses
import enum
from typing import NamedTuple, Optional

import numpy as np
from scipy.linalg import sqrtm

import raocp_tpu.core.constraints.cones as cones

__all__ = ["NodeKind", "Node", "Nonleaf", "Leaf", "Dynamics", "Quadratic",
           "ConicForm", "avar_conic_form", "AVaR"]


# ---------------------------------------------------------------------------
# node kinds
# ---------------------------------------------------------------------------

class NodeKind(enum.Enum):
    """Which tree positions an element applies to.

    The reference models this as a three-class hierarchy
    (``nodes.py:3,16,25``); a closed enum with the same two predicates is the
    value-semantics equivalent.
    """

    GENERIC = "generic"
    NONLEAF = "nonleaf"
    LEAF = "leaf"

    @property
    def is_nonleaf(self) -> bool:
        return self is NodeKind.NONLEAF

    @property
    def is_leaf(self) -> bool:
        return self is NodeKind.LEAF


def Node() -> NodeKind:
    """Generic (untagged) node kind."""
    return NodeKind.GENERIC


def Nonleaf() -> NodeKind:
    """Internal-node kind (has children; carries controls)."""
    return NodeKind.NONLEAF


def Leaf() -> NodeKind:
    """Terminal-node kind (no children, state only)."""
    return NodeKind.LEAF


# ---------------------------------------------------------------------------
# dynamics
# ---------------------------------------------------------------------------

def _as_matrix(value, label: str) -> np.ndarray:
    out = np.asarray(value, dtype=np.float64)
    if out.ndim != 2:
        raise ValueError(f"{label} must be a 2-D matrix, got shape {out.shape}")
    return out


@dataclasses.dataclass(frozen=True, eq=False)
class Dynamics:
    """One mode of the linear system ``x+ = A x + B u``.

    Parity: reference ``dynamics.py:3`` (row-count agreement enforced).
    """

    state_dynamics: np.ndarray
    control_dynamics: np.ndarray

    def __post_init__(self):
        a = _as_matrix(self.state_dynamics, "state dynamics (A)")
        b = _as_matrix(self.control_dynamics, "control dynamics (B)")
        if a.shape[0] != b.shape[0]:
            raise ValueError(
                f"A has {a.shape[0]} rows but B has {b.shape[0]} — the "
                "dynamics matrices must agree on the state dimension")
        object.__setattr__(self, "state_dynamics", a)
        object.__setattr__(self, "control_dynamics", b)

    @property
    def state_size(self) -> int:
        return self.state_dynamics.shape[1]

    @property
    def control_size(self) -> int:
        return self.control_dynamics.shape[1]


# ---------------------------------------------------------------------------
# quadratic cost
# ---------------------------------------------------------------------------

def _psd_sqrt(weights: np.ndarray, label: str) -> np.ndarray:
    """Symmetric matrix square root (the factor the L operator consumes)."""
    w = _as_matrix(weights, label)
    if w.shape[0] != w.shape[1]:
        raise ValueError(f"{label} must be square, got shape {w.shape}")
    return np.real(sqrtm(w))


@dataclasses.dataclass(frozen=True, eq=False)
class Quadratic:
    """Quadratic stage cost ``x'Qx`` (+ ``u'Ru`` on nonleaf nodes).

    Parity: reference ``costs.py:4``. Only the square roots enter the solver
    (they form the SOC rows of the L operator), so they are realized once
    here, at declaration time, on the host.
    """

    node_type: NodeKind
    state_weights: np.ndarray
    control_weights: Optional[np.ndarray] = None
    sqrt_state_weights: np.ndarray = dataclasses.field(init=False)
    sqrt_control_weights: Optional[np.ndarray] = dataclasses.field(init=False)

    def __post_init__(self):
        kind = self.node_type
        if kind.is_nonleaf:
            if self.control_weights is None:
                raise ValueError("nonleaf quadratic cost needs control "
                                 "weights (R)")
        elif kind.is_leaf:
            if self.control_weights is not None:
                raise ValueError("leaf quadratic cost takes no control "
                                 "weights")
        else:
            raise ValueError("quadratic cost needs a Nonleaf() or Leaf() tag")
        object.__setattr__(
            self, "state_weights",
            _as_matrix(self.state_weights, "state weights (Q)"))
        object.__setattr__(
            self, "sqrt_state_weights",
            _psd_sqrt(self.state_weights, "state weights (Q)"))
        if kind.is_nonleaf:
            object.__setattr__(
                self, "control_weights",
                _as_matrix(self.control_weights, "control weights (R)"))
            object.__setattr__(
                self, "sqrt_control_weights",
                _psd_sqrt(self.control_weights, "control weights (R)"))
        else:
            object.__setattr__(self, "sqrt_control_weights", None)

    def __str__(self) -> str:
        return f"Cost item; type: {type(self).__name__}"

    __repr__ = __str__


# ---------------------------------------------------------------------------
# risk measures
# ---------------------------------------------------------------------------

class ConicForm(NamedTuple):
    """Conic description ``{mu : E mu + F nu <=_K b}`` of an ambiguity set."""

    matrix_e: np.ndarray
    matrix_f: np.ndarray
    cone: "cones.Cartesian"
    vector_b: np.ndarray


def avar_conic_form(alpha: float, child_probs) -> ConicForm:
    """Realize the AVaR_alpha ambiguity set for given child probabilities.

    With ``c`` children and conditional probabilities ``pi`` the set is
    ``{mu : E mu <=_K b}``, ``E = [alpha*I; -I; 1']``, ``F`` empty,
    ``K = NnOC(2c) x Zero(1)``, ``b = [pi; 0_c; 1]`` (parity: reference
    ``risks.py:28-35``).
    """
    pi = np.asarray(child_probs, dtype=np.float64).reshape(-1)
    c = pi.size
    eye_c = np.eye(c)
    matrix_e = np.concatenate(
        [alpha * eye_c, -eye_c, np.ones((1, c))], axis=0)
    matrix_f = np.empty((2 * c + 1, 0))
    cone = cones.Cartesian([cones.NonnegativeOrthant(dimension=2 * c),
                            cones.Zero(dimension=1)])
    vector_b = np.concatenate([pi, np.zeros(c), [1.0]]).reshape(-1, 1)
    return ConicForm(matrix_e, matrix_f, cone, vector_b)


class AVaR:
    """Average Value at Risk at level ``alpha`` (a coherent risk measure).

    Declared with only ``alpha``; assigning :attr:`probs` (the conditional
    child probabilities of a node) realizes the conic form of the ambiguity
    set via :func:`avar_conic_form`. Parity: reference ``risks.py:5``.
    """

    is_risk = True

    def __init__(self, alpha: float):
        if not 0.0 <= alpha <= 1.0:
            raise ValueError(
                f"AVaR level must lie in [0, 1], got {alpha}")
        self._alpha = float(alpha)
        self._probs: Optional[np.ndarray] = None
        self._conic: Optional[ConicForm] = None

    def for_children(self, child_probs) -> "AVaR":
        """A realized copy of this risk for one node's child probabilities."""
        realized = AVaR(self._alpha)
        realized.probs = child_probs
        return realized

    @property
    def alpha(self) -> float:
        return self._alpha

    @property
    def probs(self) -> Optional[np.ndarray]:
        return self._probs

    @probs.setter
    def probs(self, child_probs) -> None:
        self._probs = np.asarray(child_probs, dtype=np.float64).reshape(-1)
        self._conic = avar_conic_form(self._alpha, self._probs)

    def _realized(self) -> ConicForm:
        if self._conic is None:
            raise ValueError("risk not realized — assign .probs first")
        return self._conic

    @property
    def matrix_e(self) -> np.ndarray:
        return self._realized().matrix_e

    @property
    def matrix_f(self) -> np.ndarray:
        return self._realized().matrix_f

    @property
    def cone(self):
        return self._realized().cone

    @property
    def vector_b(self) -> np.ndarray:
        return self._realized().vector_b

    def __str__(self) -> str:
        cone = "unrealized" if self._conic is None else self._conic.cone.types
        return (f"Risk item; type: {type(self).__name__}, "
                f"alpha: {self._alpha}; cone: {cone}")

    __repr__ = __str__
