import raocp_tpu.core.constraints  # noqa: F401
from raocp_tpu.core.tree import ScenarioTree, MarkovChainScenarioTreeFactory
from raocp_tpu.core.nodes import Node, Nonleaf, Leaf
from raocp_tpu.core.dynamics import Dynamics
from raocp_tpu.core.costs import Quadratic
from raocp_tpu.core.risks import AVaR
from raocp_tpu.core.spec import RAOCP
from raocp_tpu.core.stacked import StackedProblem, build_stacked
from raocp_tpu.core.variables import Primal, Dual

__all__ = [
    "ScenarioTree",
    "MarkovChainScenarioTreeFactory",
    "Node",
    "Nonleaf",
    "Leaf",
    "Dynamics",
    "Quadratic",
    "AVaR",
    "RAOCP",
    "StackedProblem",
    "build_stacked",
    "Primal",
    "Dual",
]
