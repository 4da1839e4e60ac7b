import raocp_tpu.core.constraints  # noqa: F401
from raocp_tpu.core.tree import ScenarioTree, MarkovChainScenarioTreeFactory
from raocp_tpu.core.elements import (Node, Nonleaf, Leaf, NodeKind,
                                     Dynamics, Quadratic, AVaR,
                                     TotalVariation, MeanUpperSemideviation,
                                     ConicRisk, ConicForm)
from raocp_tpu.core.spec import RAOCP
from raocp_tpu.core.stacked import StackedProblem, build_stacked
from raocp_tpu.core.variables import Primal, Dual

__all__ = [
    "ScenarioTree",
    "MarkovChainScenarioTreeFactory",
    "Node",
    "NodeKind",
    "Nonleaf",
    "Leaf",
    "Dynamics",
    "Quadratic",
    "AVaR",
    "TotalVariation",
    "MeanUpperSemideviation",
    "ConicRisk",
    "ConicForm",
    "RAOCP",
    "StackedProblem",
    "build_stacked",
    "Primal",
    "Dual",
]
