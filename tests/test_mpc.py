"""Closed-loop risk-averse MPC runner (BASELINE config 5 behaviour).

The reference has no closed-loop machinery (its main.py is one open-loop
solve); these tests pin down the new runner: trajectory shapes, convergence
of every per-step solve, solver caching per root mode, warm-start shape
compatibility, and that the plant state is driven toward the origin by the
risk-averse controller on the stable demo plant.
"""

import numpy as np
import pytest

from raocp_tpu.models import demo_mpc_controller
from raocp_tpu.mpc import RiskAverseMPC


@pytest.fixture(scope="module")
def demo_run():
    controller, x0 = demo_mpc_controller()
    result = controller.run(x0, num_steps=6, initial_mode=1, seed=7,
                            max_iters=3000, tol=1e-3)
    return controller, x0, result


def test_closed_loop_shapes(demo_run):
    _, x0, result = demo_run
    assert result.states.shape == (7, 3)
    assert result.inputs.shape == (6, 2)
    assert result.modes.shape == (7,)
    assert result.stage_costs.shape == (6,)
    assert result.num_steps == 6
    np.testing.assert_allclose(result.states[0], x0)


def test_closed_loop_converges_every_step(demo_run):
    _, _, result = demo_run
    assert result.converged
    assert np.all(result.iterations > 0)
    assert np.all(np.isfinite(result.states))
    assert np.all(np.isfinite(result.stage_costs))
    assert result.total_cost > 0


def test_modes_follow_transition_support(demo_run):
    controller, _, result = demo_run
    p = np.array([[0.1, 0.8, 0.1],
                  [0.4, 0.6, 0.0],
                  [0.0, 0.3, 0.7]])
    for w, w_next in zip(result.modes[:-1], result.modes[1:]):
        assert p[w, w_next] > 0


def test_input_constraints_respected(demo_run):
    _, _, result = demo_run
    # demo problem box: |u| <= 0.1 (solver tol leaks at most ~tol)
    assert np.all(np.abs(result.inputs) <= 0.1 + 1e-2)


def test_solver_cached_per_mode(demo_run):
    controller, x0, result = demo_run
    solver_a, _ = controller.solver_for_mode(1)
    solver_b, _ = controller.solver_for_mode(1)
    assert solver_a is solver_b


def test_plant_step_matches_mode_dynamics(demo_run):
    controller, _, result = demo_run
    _, problem = controller.solver_for_mode(int(result.modes[0]))
    x, u = result.states[0], result.inputs[0]
    w_next = int(result.modes[1])
    child = RiskAverseMPC._child_with_mode(problem, w_next)
    A = problem.state_dynamics_at_node(child)
    B = problem.control_dynamics_at_node(child)
    np.testing.assert_allclose(result.states[1], A @ x + B @ u, atol=1e-12)


def test_warm_start_runs_and_helps():
    controller, x0 = demo_mpc_controller()
    cold = controller.run(x0, num_steps=4, initial_mode=0, seed=3,
                          max_iters=3000, tol=1e-3, warm_start=False)
    warm = controller.run(x0, num_steps=4, initial_mode=0, seed=3,
                          max_iters=3000, tol=1e-3, warm_start=True)
    # identical disturbance realisation => identical first solve; later warm
    # solves must never be (much) worse in total
    assert warm.iterations[0] == cold.iterations[0]
    assert warm.iterations.sum() <= cold.iterations.sum() * 1.05
    np.testing.assert_allclose(warm.states[1], cold.states[1], atol=1e-6)


def test_closed_loop_on_mesh_matches_single_device():
    """RiskAverseMPC(mesh=...) (BASELINE config 5's 'partitioned across 2+
    hosts' formulation): the closed loop on the 8-device mesh must realise
    the same trajectory, controls, and per-step iteration counts as the
    single-device run — the mesh changes where work happens, not the math."""
    from raocp_tpu.parallel import make_mesh

    mesh = make_mesh(num_devices=8)
    sharded, x0 = demo_mpc_controller(mesh=mesh)
    single, _ = demo_mpc_controller()

    kw = dict(num_steps=3, initial_mode=1, seed=7, max_iters=3000, tol=1e-3)
    run_sh = sharded.run(x0, **kw)
    run_1 = single.run(x0, **kw)

    assert run_sh.converged
    np.testing.assert_array_equal(run_sh.iterations, run_1.iterations)
    np.testing.assert_array_equal(run_sh.modes, run_1.modes)
    np.testing.assert_allclose(run_sh.states, run_1.states, atol=1e-9)
    np.testing.assert_allclose(run_sh.inputs, run_1.inputs, atol=1e-9)

    # the production deployment shape: mesh-partitioned MPC with chunked
    # per-step solves (RiskAverseMPC forwards chunk_iters; round 4
    # silently dropped it on this path) — identical closed loop
    run_ck = sharded.run(x0, chunk_iters=500, **kw)
    np.testing.assert_array_equal(run_ck.iterations, run_sh.iterations)
    np.testing.assert_allclose(run_ck.states, run_sh.states, atol=1e-9)
    np.testing.assert_allclose(run_ck.inputs, run_sh.inputs, atol=1e-9)
