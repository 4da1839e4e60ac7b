"""Tests for the stacked problem builder and the offline phase.

The stage-batched Riccati factorisation is cross-checked against a per-node
numpy oracle that follows the reference recursion exactly
(cache.py:207-233); the kernel projectors are checked for the algebraic
projector properties and against scipy null-space bases.
"""

import numpy as np
import pytest
import scipy.linalg

from raocp_tpu.core.stacked import build_stacked
from raocp_tpu.models import demo_problem, mass_spring_problem, \
    random_network_problem

from util import riccati_oracle


@pytest.fixture(scope="module", params=["demo", "spring", "network"])
def spec_and_sp(request):
    problem = {
        "demo": lambda: demo_problem(),
        "spring": lambda: mass_spring_problem(num_masses=3, num_stages=5),
        "network": lambda: random_network_problem(
            num_states=6, num_inputs=3, num_modes=3, num_stages=5,
            stopping_time=3),
    }[request.param]()[0]
    # keep_dense: these tests cross-check the dense offline stacks against
    # per-node oracles; the default build drops the ones the solve never
    # reads (see test_dense_stacks_elided_when_unused)
    return problem, build_stacked(problem, keep_dense=True)


def test_riccati_matches_oracle(spec_and_sp):
    spec, sp = spec_and_sp
    P_ref, K_ref, Abar_ref = riccati_oracle(spec)
    P = np.asarray(sp.P)
    K = np.asarray(sp.K)
    Abar = np.asarray(sp.Abar)
    for i in range(sp.num_nodes):
        np.testing.assert_allclose(P[i], P_ref[i], atol=1e-9)
    for i in range(sp.num_nonleaf):
        np.testing.assert_allclose(K[i], K_ref[i], atol=1e-9)
    for j in range(1, sp.num_nodes):
        np.testing.assert_allclose(Abar[j], Abar_ref[j], atol=1e-9)


def test_rinv_and_sumapb(spec_and_sp):
    spec, sp = spec_and_sp
    tree = spec.tree
    P = np.asarray(sp.P)
    Rinv = np.asarray(sp.Rinv)
    Abar = np.asarray(sp.Abar)
    sumAPB = np.asarray(sp.sumAPB)
    m = sp.m
    for i in range(sp.num_nonleaf):
        children = tree.children_of(i)
        r_tilde = np.eye(m) + sum(
            spec.control_dynamics_at_node(j).T @ P[j]
            @ spec.control_dynamics_at_node(j) for j in children)
        np.testing.assert_allclose(Rinv[i] @ r_tilde, np.eye(m), atol=1e-9)
        expected = sum(Abar[j].T @ P[j] @ spec.control_dynamics_at_node(j)
                       for j in children)
        np.testing.assert_allclose(sumAPB[i], expected, atol=1e-9)


def test_kernel_projector_properties(spec_and_sp):
    spec, sp = spec_and_sp
    tree = spec.tree
    Pi = np.asarray(sp.Pi)
    d = sp.d_max
    Y = sp.Y
    for i in range(sp.num_nonleaf):
        # symmetric and idempotent
        np.testing.assert_allclose(Pi[i], Pi[i].T, atol=1e-10)
        np.testing.assert_allclose(Pi[i] @ Pi[i], Pi[i], atol=1e-10)
        # annihilates the kernel constraint in the padded layout
        risk = spec.risk_at_node(i)
        c = len(tree.children_of(i))
        eye = np.eye(c)
        zeros = np.zeros((risk.matrix_f.shape[1], c))
        M = np.vstack((np.hstack((risk.matrix_e.T, -eye, -eye)),
                       np.hstack((risk.matrix_f.T, zeros, zeros))))
        emb = np.concatenate((np.arange(risk.matrix_e.shape[0]),
                              Y + np.arange(c), Y + d + np.arange(c)))
        M_pad = np.zeros((M.shape[0], sp.D))
        M_pad[:, emb] = M
        assert np.abs(M_pad @ Pi[i]).max() < 1e-9
        # rank equals null-space dimension
        ns = scipy.linalg.null_space(M)
        assert round(np.trace(Pi[i])) == ns.shape[1]
        # padded rows/cols are zero
        pad = np.ones(sp.D, dtype=bool)
        pad[emb] = False
        assert np.abs(Pi[i][pad]).max(initial=0) == 0
        assert np.abs(Pi[i][:, pad]).max(initial=0) == 0


def test_stage_constant_riccati_tables(spec_and_sp):
    """Where build_stacked declares a stage's Riccati factors constant
    (uniform mode patterns from there to the leaves), every node of the
    stage must indeed carry identical K / Rinv / sumAPB — the DP sweeps
    then use the single-representative tables."""
    _, sp = spec_and_sp
    ss = sp.stage_start
    for k in range(sp.num_stages - 1):
        a, b = ss[k], ss[k + 1]
        if sp.k_s[k] is not None:
            for stack, table in ((sp.K, sp.k_s), (sp.Rinv, sp.rinv_s),
                                 (sp.sumAPB, sp.sumapb_s)):
                rows = np.asarray(stack[a:b])
                assert np.allclose(rows, np.asarray(table[k]), atol=1e-10)


def test_stacked_layouts(spec_and_sp):
    spec, sp = spec_and_sp
    tree = spec.tree
    b_pad = np.asarray(sp.b_pad)
    y_mask = np.asarray(sp.y_mask)
    risk_free = np.asarray(sp.risk_free_rows)
    risk_zero = np.asarray(sp.risk_zero_rows)
    for i in range(sp.num_nonleaf):
        c = len(tree.children_of(i))
        b = spec.risk_at_node(i).vector_b.reshape(-1)
        # natural row order: AVaR rows [pi; 0_c; 1] occupy slots [0, 2c+1)
        np.testing.assert_allclose(b_pad[i, :2 * c + 1], b)
        assert (b_pad[i, 2 * c + 1:] == 0).all()
        assert y_mask[i].sum() == 2 * c + 1
        # AVaR cone NnOC(2c) x Zero(1): the Zero row sits at slot 2c
        assert risk_free[i, 2 * c] and risk_free[i].sum() == 1
        assert not risk_zero[i].any()
    # dynamics stacked correctly
    A = np.asarray(sp.A)
    B = np.asarray(sp.B)
    for j in range(1, sp.num_nodes):
        np.testing.assert_allclose(A[j], spec.state_dynamics_at_node(j))
        np.testing.assert_allclose(B[j], spec.control_dynamics_at_node(j))
    assert (A[0] == 0).all() and (B[0] == 0).all()


def test_device_offline_matches_host():
    """build_stacked(offline='device') must reproduce the host (numpy)
    Riccati factorisation and give the same solver behaviour."""
    from raocp_tpu.models import demo_problem, random_network_problem

    # the fully-branching problem (stopping_time == num_stages) exercises
    # the host stage-table path; the others the general device program
    for problem, _ in [demo_problem(),
                       random_network_problem(num_states=5, num_inputs=2,
                                              num_modes=3, num_stages=5,
                                              stopping_time=3),
                       random_network_problem(num_states=5, num_inputs=2,
                                              num_modes=3, num_stages=4,
                                              stopping_time=4)]:
        host = build_stacked(problem, offline="host", keep_dense=True)
        dev = build_stacked(problem, offline="device", keep_dense=True)
        for name in ("A", "B", "P", "Rinv", "K", "Abar", "sumAPB"):
            np.testing.assert_allclose(
                np.asarray(getattr(dev, name)), np.asarray(getattr(host, name)),
                atol=1e-9, err_msg=f"device offline mismatch in {name}")


def test_device_offline_solver_parity():
    """End-to-end: the device-offline solver hits the 937-iteration oracle."""
    from raocp_tpu.models import demo_problem
    from raocp_tpu.solver import Solver

    problem, x0 = demo_problem()
    res = Solver(problem, offline="device").solve(x0, max_iters=2000, tol=1e-3)
    assert res.status == 0
    assert res.num_iters == 937


def test_dense_stacks_elided_when_unused():
    """Default builds materialise only the dense stacks the solve loop
    reads: none on a fully stage-constant tree (the sweeps use the
    per-stage tables), K/Rinv/sumAPB on trees with ragged stages, and
    A/B/P/Abar never — they are dead HBM at scale (~3.5 GB at 1e5 nodes /
    50 states f32)."""
    # fully branching => fully stage-constant => no dense stacks at all
    fully, _ = random_network_problem(num_states=5, num_inputs=2,
                                      num_modes=3, num_stages=4,
                                      stopping_time=4)
    for offline in ("host", "device"):
        sp = build_stacked(fully, offline=offline)
        for name in ("A", "B", "P", "Rinv", "K", "Abar", "sumAPB"):
            assert getattr(sp, name) is None, (offline, name)
        assert all(t is not None for t in sp.k_s)

    # ragged (post-stopping chains) => fallback sweeps need K/Rinv/sumAPB
    ragged, _ = demo_problem()
    for offline in ("host", "device"):
        sp = build_stacked(ragged, offline=offline)
        for name in ("A", "B", "P", "Abar"):
            assert getattr(sp, name) is None, (offline, name)
        for name in ("Rinv", "K", "sumAPB"):
            assert getattr(sp, name) is not None, (offline, name)


def test_elided_build_solves_to_parity():
    """The stage-table-only build (no dense stacks) must solve the fully
    stage-constant family to the same iterates as keep_dense=True."""
    import jax

    from raocp_tpu.solver import Solver, cp_iteration
    from raocp_tpu.ops.operator import ell, ell_t

    problem, x0 = random_network_problem(num_states=5, num_inputs=2,
                                         num_modes=3, num_stages=4,
                                         stopping_time=4)
    import jax.numpy as jnp
    sp_lean = build_stacked(problem)
    sp_full = build_stacked(problem, keep_dense=True)
    x0j = jnp.asarray(np.asarray(x0), sp_lean.dtype)
    z = sp_lean.zero_primal()
    z = z._replace(x=z.x.at[0].set(x0j))
    eta = sp_lean.zero_dual()
    alpha = 0.2
    out_lean = cp_iteration(sp_lean, z, eta, ell(sp_lean, z),
                            ell_t(sp_lean, eta), alpha, alpha, x0j)
    out_full = cp_iteration(sp_full, z, eta, ell(sp_full, z),
                            ell_t(sp_full, eta), alpha, alpha, x0j)
    for a, b in zip(jax.tree_util.tree_leaves(out_lean),
                    jax.tree_util.tree_leaves(out_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)

    res = Solver(problem).solve(x0, max_iters=5000, tol=1e-3)
    assert res.converged


def test_mode_constant_riccati_tables_chain_tree():
    """Stopped Markov trees (uniform branching + post-stopping chains —
    the reference's standard shape) must need NO dense offline stacks: the
    chain stages get [num_modes, ...] mode tables indexed by riccati_cls,
    and the dynamics projection matches the dense fallback exactly. Without
    this, 1e5-node/100-state builds OOM a 16 GB chip (the general device
    factorisation peaks ~10 GB)."""
    import jax.numpy as jnp

    from raocp_tpu.models import random_network_problem
    from raocp_tpu.ops.prox import project_dynamics

    problem, x0 = random_network_problem(
        num_states=8, num_inputs=3, num_modes=3, num_stages=6,
        stopping_time=4)
    sp = build_stacked(problem)
    # chain stages (4, 5) are mode-tabled; branching stages stage-constant
    assert [t is not None for t in sp.k_s] == [True] * 4 + [False] * 2
    assert [t is not None for t in sp.k_ms] == [False] * 4 + [True] * 2
    assert sp.riccati_cls is not None
    # the memory win: no dense per-node stacks at all
    assert sp.K is None and sp.Rinv is None and sp.sumAPB is None

    sp_dense = build_stacked(problem, keep_dense=True)
    assert sp_dense.K is not None
    rng = np.random.default_rng(0)
    x_in = jnp.asarray(rng.standard_normal((sp.np_pad, sp.n)), sp.dtype)
    u_in = jnp.asarray(rng.standard_normal((sp.nl_pad, sp.m)), sp.dtype)
    x0j = jnp.asarray(np.asarray(x0), sp.dtype)
    xa, ua = project_dynamics(sp, x_in, u_in, x0j)
    xb, ub = project_dynamics(sp_dense, x_in, u_in, x0j)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ua), np.asarray(ub), atol=1e-10)


def test_mode_constant_tables_full_solve_and_subtree():
    """Full-solve parity of the tabled chain tree against the dense build,
    single-device and under the 8-device subtree partition."""
    import jax

    from raocp_tpu.models import random_network_problem
    from raocp_tpu.parallel import make_mesh
    from raocp_tpu.solver import Solver

    problem, x0 = random_network_problem(
        num_states=6, num_inputs=2, num_modes=3, num_stages=5,
        stopping_time=3)
    fast = Solver(problem).solve(x0, max_iters=3000, tol=1e-3)
    mesh = make_mesh(num_devices=8)
    sub = Solver(problem, mesh=mesh)
    assert sub.subtree is not None
    res = sub.solve(x0, max_iters=3000, tol=1e-3)
    assert fast.converged and res.num_iters == fast.num_iters
    for a, b in zip(jax.tree_util.tree_leaves(res.primal),
                    jax.tree_util.tree_leaves(fast.primal)):
        np.testing.assert_allclose(a, b, atol=1e-10)
