"""RAOCP problem specification (fluent builder).

Parity: reference ``raocp/core/raocp_spec.py:6`` — identical method names and
validation semantics (Markovian indexing by the node's disturbance value,
all-node broadcasting, the dynamics-before-constraints rule, per-node risk
probability injection). The per-node object lists here are a thin
specification layer; :mod:`raocp_tpu.core.stacked` materialises them into
stacked, padded device arrays for the batched solver.
"""

from copy import deepcopy

import raocp_tpu.core.constraints as core_constraints
import raocp_tpu.core.tree as core_tree

__all__ = ["RAOCP"]


class RAOCP:
    """Risk-averse optimal control problem creation and storage."""

    def __init__(self, scenario_tree: core_tree.ScenarioTree):
        self.__tree = scenario_tree
        self.__num_nodes = scenario_tree.num_nodes
        self.__num_nonleaf_nodes = scenario_tree.num_nonleaf_nodes
        self.__list_of_dynamics = [None] * self.__num_nodes
        self.__list_of_nonleaf_costs = [None] * self.__num_nodes
        self.__list_of_leaf_costs = [None] * self.__num_nodes
        self.__list_of_nonleaf_constraints = [None] * self.__num_nodes
        self.__list_of_leaf_constraints = [None] * self.__num_nodes
        self.__list_of_risks = [None] * self.__num_nonleaf_nodes
        self._load_constraints()

    # -- getters ------------------------------------------------------------

    @property
    def tree(self) -> core_tree.ScenarioTree:
        return self.__tree

    @property
    def list_of_dynamics(self):
        return self.__list_of_dynamics

    @property
    def list_of_nonleaf_costs(self):
        return self.__list_of_nonleaf_costs

    @property
    def list_of_leaf_costs(self):
        return self.__list_of_leaf_costs

    @property
    def list_of_nonleaf_constraints(self):
        return self.__list_of_nonleaf_constraints

    @property
    def list_of_leaf_constraints(self):
        return self.__list_of_leaf_constraints

    @property
    def list_of_risks(self):
        return self.__list_of_risks

    def state_dynamics_at_node(self, idx):
        return self.__list_of_dynamics[idx].state_dynamics

    def control_dynamics_at_node(self, idx):
        return self.__list_of_dynamics[idx].control_dynamics

    def nonleaf_cost_at_node(self, idx):
        return self.__list_of_nonleaf_costs[idx]

    def leaf_cost_at_node(self, idx):
        return self.__list_of_leaf_costs[idx]

    def nonleaf_constraint_at_node(self, idx):
        return self.__list_of_nonleaf_constraints[idx]

    def leaf_constraint_at_node(self, idx):
        return self.__list_of_leaf_constraints[idx]

    def risk_at_node(self, idx):
        return self.__list_of_risks[idx]

    @property
    def state_size(self) -> int:
        return self.state_dynamics_at_node(1).shape[1]

    @property
    def control_size(self) -> int:
        return self.control_dynamics_at_node(1).shape[1]

    # -- validation helpers --------------------------------------------------

    def _is_dynamics_given(self) -> bool:
        return self.__list_of_dynamics[1] is not None

    def _check_dynamics_before_constraints(self) -> None:
        if not self._is_dynamics_given():
            raise Exception("Constraints provided before dynamics - "
                            "dynamics must be provided first")

    def _load_constraints(self) -> None:
        for i in range(self.__num_nodes):
            if i < self.__num_nonleaf_nodes:
                self.__list_of_nonleaf_constraints[i] = core_constraints.No()
            else:
                self.__list_of_leaf_constraints[i] = core_constraints.No()

    # -- dynamics -------------------------------------------------------------

    def with_markovian_dynamics(self, ordered_list_of_dynamics):
        """Assign ``dynamics[w]`` to every node with disturbance value ``w``."""
        first = ordered_list_of_dynamics[0]
        for dyn in ordered_list_of_dynamics:
            if dyn.state_dynamics.shape != first.state_dynamics.shape:
                raise ValueError(
                    "Markovian state dynamics matrices are different shapes")
            if dyn.control_dynamics.shape != first.control_dynamics.shape:
                raise ValueError(
                    "Markovian control dynamics matrices are different shapes")
        if not self.__tree.is_markovian:
            raise TypeError("dynamics provided as Markovian, scenario tree "
                            "provided is not Markovian")
        for i in range(1, self.__num_nodes):
            self.__list_of_dynamics[i] = \
                ordered_list_of_dynamics[self.__tree.value_at_node(i)]
        return self

    # -- costs ----------------------------------------------------------------

    def with_markovian_nonleaf_costs(self, ordered_list_of_costs):
        for cost in ordered_list_of_costs:
            if not cost.node_type.is_nonleaf:
                raise Exception("Markovian costs provided are not nonleaf")
        if not self.__tree.is_markovian:
            raise TypeError("costs provided as Markovian, scenario tree "
                            "provided is not Markovian")
        # costs are immutable once built; sharing one instance per mode
        # (instead of the reference's per-node deepcopy, raocp_spec.py:127)
        # keeps assembly O(modes) in memory and seconds at 10^5 nodes
        for i in range(1, self.__num_nodes):
            self.__list_of_nonleaf_costs[i] = \
                ordered_list_of_costs[self.__tree.value_at_node(i)]
        return self

    def with_all_nonleaf_costs(self, cost):
        if not cost.node_type.is_nonleaf:
            raise Exception("Nonleaf cost provided is not nonleaf")
        for i in range(1, self.__num_nodes):
            self.__list_of_nonleaf_costs[i] = cost
        return self

    def with_all_leaf_costs(self, cost):
        if not cost.node_type.is_leaf:
            raise Exception("Leaf cost provided is not leaf")
        for i in range(self.__num_nonleaf_nodes, self.__num_nodes):
            self.__list_of_leaf_costs[i] = cost
        return self

    # -- constraints ------------------------------------------------------------

    def with_all_nonleaf_constraints(self, nonleaf_constraint):
        self._check_dynamics_before_constraints()
        if not nonleaf_constraint.node_type.is_nonleaf:
            raise Exception("Nonleaf constraint provided is not nonleaf")
        nonleaf_constraint.state_size = \
            self.__list_of_dynamics[-1].state_dynamics.shape[1]
        nonleaf_constraint.control_size = \
            self.__list_of_dynamics[-1].control_dynamics.shape[1]
        # constraints are immutable after size injection; share the instance
        for i in range(self.__num_nonleaf_nodes):
            self.__list_of_nonleaf_constraints[i] = nonleaf_constraint
        return self

    def with_all_leaf_constraints(self, leaf_constraint):
        self._check_dynamics_before_constraints()
        if not leaf_constraint.node_type.is_leaf:
            raise Exception("Leaf constraint provided is not leaf")
        leaf_constraint.state_size = \
            self.__list_of_dynamics[-1].state_dynamics.shape[1]
        for i in range(self.__num_nonleaf_nodes, self.__num_nodes):
            self.__list_of_leaf_constraints[i] = leaf_constraint
        return self

    # -- risks --------------------------------------------------------------------

    def with_all_risks(self, risk):
        if not risk.is_risk:
            raise Exception("Risk provided is not of risk type")
        for i in range(self.__num_nonleaf_nodes):
            risk_i = deepcopy(risk)
            risk_i.probs = self.__tree.conditional_probabilities_of_children(i)
            self.__list_of_risks[i] = risk_i
        return self

    # -- display --------------------------------------------------------------------

    def __str__(self) -> str:
        return (f"RAOCP\n+ Nodes: {self.__tree.num_nodes}\n"
                f"+ {self.__list_of_nonleaf_costs[0]}\n"
                f"+ {self.__list_of_risks[0]}")

    def __repr__(self) -> str:
        return (f"RAOCP with {self.__tree.num_nodes} nodes, "
                f"with root cost: "
                f"{type(self.__list_of_nonleaf_costs[0]).__name__}, "
                f"with root risk: {type(self.__list_of_risks[0]).__name__}.")
