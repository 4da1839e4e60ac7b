#!/usr/bin/env python
"""Measure the reference (pure-NumPy) implementation's CP iteration rate on
the benchmark problem, recording it to BASELINE_MEASURED.json.

Run once on the build machine:  python scripts/measure_reference.py
The reference package is imported from /root/reference (read-only); heavy
GUI deps it imports (turtle, matplotlib, tikzplotlib) are stubbed.
"""

import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# stub GUI-only modules the reference imports at module scope
for name in ("turtle", "tikzplotlib"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
mpl = types.ModuleType("matplotlib")
mpl.pyplot = types.ModuleType("matplotlib.pyplot")
sys.modules.setdefault("matplotlib", mpl)
sys.modules.setdefault("matplotlib.pyplot", mpl.pyplot)

sys.path.insert(0, REFERENCE)
sys.path.insert(0, REPO)

NUM_TIMED_ITERS = 3


def build_reference_problem():
    """The bench problem (models/examples.py random_network_problem with the
    bench.py arguments), expressed with the reference's own API."""
    import raocp.core.costs as costs
    import raocp.core.dynamics as dynamics
    import raocp.core.nodes as nodes
    import raocp.core.risks as risks
    import raocp.core.constraints.rectangle as rectangle
    from raocp.core.raocp_spec import RAOCP
    from raocp.core.scenario_tree import MarkovChainScenarioTreeFactory

    from raocp_tpu.models import random_network_problem

    # reuse our generator for identical matrices, then mirror into the
    # reference's spec objects
    ours, x0 = random_network_problem(
        num_states=50, num_inputs=20, num_modes=3, num_stages=8,
        stopping_time=8)
    tree_ours = ours.tree

    rng = np.random.default_rng(0)
    p = rng.random((3, 3)) + 0.1
    p /= p.sum(axis=1, keepdims=True)
    v = rng.random(3) + 0.1
    v /= v.sum()
    tree = MarkovChainScenarioTreeFactory(p, v, 8, 8).create()
    assert tree.num_nodes == tree_ours.num_nodes

    nl, lf = nodes.Nonleaf(), nodes.Leaf()
    dyn = [dynamics.Dynamics(ours.state_dynamics_at_node(j),
                             ours.control_dynamics_at_node(j))
           for j in [1, 2, 3]]
    # nodes 1..3 are stage-1 nodes with w = 0,1,2 in cover order
    w_order = [int(tree_ours.value_at_node(j)) for j in (1, 2, 3)]
    dyn_by_mode = [None] * 3
    for d, w in zip(dyn, w_order):
        dyn_by_mode[w] = d
    cost_nl = [costs.Quadratic(nl, np.eye(50), 0.1 * np.eye(20))
               for _ in range(3)]
    cost_lf = costs.Quadratic(lf, np.eye(50))
    nl_min = np.concatenate((np.full(50, -10.0), np.full(20, -1.0)))
    l_min = np.full(50, -10.0)

    problem = (RAOCP(scenario_tree=tree)
               .with_markovian_dynamics(dyn_by_mode)
               .with_markovian_nonleaf_costs(cost_nl)
               .with_all_leaf_costs(cost_lf)
               .with_all_risks(risks.AVaR(0.95))
               .with_all_nonleaf_constraints(
                   rectangle.Rectangle(nl, nl_min.reshape(-1, 1),
                                       -nl_min.reshape(-1, 1)))
               .with_all_leaf_constraints(
                   rectangle.Rectangle(lf, l_min.reshape(-1, 1),
                                       -l_min.reshape(-1, 1))))
    return problem, x0


def main() -> None:
    from raocp.core.cache import Cache
    from raocp.core.operators import Operator
    from raocp.core.solver import Solver

    problem, x0 = build_reference_problem()
    print(f"tree nodes: {problem.tree.num_nodes}", file=sys.stderr)

    t0 = time.perf_counter()
    solver = Solver(problem_spec=problem)
    t1 = time.perf_counter()
    print(f"offline (Cache+Operator) build: {t1 - t0:.1f}s", file=sys.stderr)

    # avoid the (very slow) scipy eigs step-size estimation: inject a step
    # size directly and time the iteration loop body exactly as chock runs it
    cache = solver._Solver__cache
    cache.cache_initial_state(x0.reshape(-1, 1))
    alpha = 0.01
    solver._Solver__parameter_1 = alpha
    solver._Solver__parameter_2 = alpha

    # one untimed iteration (first-touch allocations)
    solver.primal_k_plus_half()
    solver.primal_k_plus_one()
    solver.dual_k_plus_half()
    solver.dual_k_plus_one()
    solver._calculate_chock_errors()
    cache.update_cache()

    t2 = time.perf_counter()
    for _ in range(NUM_TIMED_ITERS):
        solver.primal_k_plus_half()
        solver.primal_k_plus_one()
        solver.dual_k_plus_half()
        solver.dual_k_plus_one()
        solver._calculate_chock_errors()
        cache.update_cache()
    t3 = time.perf_counter()

    per_iter = (t3 - t2) / NUM_TIMED_ITERS
    result = {
        "problem": "random_network 50 states / 20 inputs / 3 modes, "
                   "9841-node tree (num_stages=8, stopping_time=8)",
        "reference_iters_per_s": 1.0 / per_iter,
        "reference_seconds_per_iter": per_iter,
        "reference_offline_seconds": t1 - t0,
        "timed_iterations": NUM_TIMED_ITERS,
        "hardware": "build-machine CPU (pure NumPy/SciPy reference)",
    }
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
