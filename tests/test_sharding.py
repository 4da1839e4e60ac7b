"""Multi-device tests on the 8-virtual-device CPU mesh: the node-sharded CP
step must produce exactly the same numbers as the single-device path (GSPMD
inserts the collectives; the math is unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raocp_tpu.core.stacked import build_stacked
from raocp_tpu.models import demo_problem
from raocp_tpu.parallel import make_mesh, shard_problem, shard_variables
from raocp_tpu.solver import cp_iteration
from raocp_tpu.ops.operator import ell, ell_t

from util import random_dual, random_primal


@pytest.fixture(scope="module")
def setup():
    problem, x0 = demo_problem()
    sp = build_stacked(problem, pad_multiple=8)
    mesh = make_mesh(num_devices=8)
    sp_sharded = shard_problem(sp, mesh)
    return sp, sp_sharded, mesh, jnp.asarray(x0, sp.dtype)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_operator_matches(setup):
    sp, sp_sharded, mesh, _ = setup
    rng = np.random.default_rng(0)
    z = random_primal(sp, rng)
    eta = random_dual(sp, rng)
    ref_eta = jax.tree_util.tree_map(np.asarray, ell(sp, z))
    ref_z = jax.tree_util.tree_map(np.asarray, ell_t(sp, eta))
    z_sh = shard_variables(jax.tree_util.tree_map(jnp.asarray, z), mesh)
    eta_sh = shard_variables(jax.tree_util.tree_map(jnp.asarray, eta), mesh)
    out_eta = jax.jit(ell, static_argnums=())(sp_sharded, z_sh)
    out_z = jax.jit(ell_t)(sp_sharded, eta_sh)
    for a, b in zip(jax.tree_util.tree_leaves(out_eta),
                    jax.tree_util.tree_leaves(ref_eta)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(out_z),
                    jax.tree_util.tree_leaves(ref_z)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-12)


def test_padding_does_not_change_results():
    """pad_multiple=8 ghost rows stay zero and real rows match pad=1."""
    problem, x0 = demo_problem()
    sp1 = build_stacked(problem, pad_multiple=1)
    sp8 = build_stacked(problem, pad_multiple=8)
    rng = np.random.default_rng(7)
    z1 = random_primal(sp1, rng)
    eta1 = random_dual(sp1, rng)
    # embed into the padded shapes
    def embed(small, big_shape):
        out = np.zeros(big_shape, dtype=np.asarray(small).dtype)
        out[tuple(slice(0, s) for s in np.shape(small))] = small
        return out
    z8 = jax.tree_util.tree_map(
        lambda a, b: embed(a, b.shape), z1,
        jax.tree_util.tree_map(np.asarray, sp8.zero_primal()))
    eta8 = jax.tree_util.tree_map(
        lambda a, b: embed(a, b.shape), eta1,
        jax.tree_util.tree_map(np.asarray, sp8.zero_dual()))

    alpha, x0j = 0.2, jnp.asarray(x0, sp1.dtype)
    out1 = cp_iteration(sp1, z1, eta1, ell(sp1, z1), ell_t(sp1, eta1),
                        alpha, alpha, x0j)
    out8 = cp_iteration(sp8, z8, eta8, ell(sp8, z8), ell_t(sp8, eta8),
                        alpha, alpha, x0j)
    for a1, a8 in zip(jax.tree_util.tree_leaves(out1[:4]),
                      jax.tree_util.tree_leaves(out8[:4])):
        a1, a8 = np.asarray(a1), np.asarray(a8)
        real = tuple(slice(0, s) for s in a1.shape)
        np.testing.assert_allclose(a8[real], a1, atol=1e-12)
        # ghost rows stay exactly zero
        if a8.shape[0] > a1.shape[0]:
            assert np.abs(a8[a1.shape[0]:]).max() == 0
    np.testing.assert_allclose(np.asarray(out8[4]), np.asarray(out1[4]),
                               atol=1e-12)


def test_sharded_cp_step_matches(setup):
    sp, sp_sharded, mesh, x0 = setup
    rng = np.random.default_rng(1)
    z = jax.tree_util.tree_map(jnp.asarray, random_primal(sp, rng))
    eta = jax.tree_util.tree_map(jnp.asarray, random_dual(sp, rng))
    Lz = ell(sp, z)
    LtEta = ell_t(sp, eta)
    alpha = 0.2

    ref = jax.jit(cp_iteration, static_argnums=())(
        sp, z, eta, Lz, LtEta, alpha, alpha, x0)

    z_sh = shard_variables(z, mesh)
    eta_sh = shard_variables(eta, mesh)
    Lz_sh = shard_variables(Lz, mesh)
    LtEta_sh = shard_variables(LtEta, mesh)
    out = jax.jit(cp_iteration)(
        sp_sharded, z_sh, eta_sh, Lz_sh, LtEta_sh, alpha, alpha, x0)

    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_sharded_step_matches_with_l2ball_and_polyhedral():
    """The new optional fields (Polyhedral row matrix, SOC risk masks) keep
    sharded-vs-single-device equality: a problem with an L2Ball risk and a
    general-row nonleaf constraint steps identically on the 8-device mesh."""
    from raocp_tpu import L2Ball, Polyhedral
    from raocp_tpu.core.elements import Nonleaf

    problem, x0 = demo_problem(risk=L2Ball(0.3))
    G = np.vstack([np.eye(5), [[1.0, -1.0, 0.0, 0.0, 1.0]]])
    problem.with_all_nonleaf_constraints(
        Polyhedral(Nonleaf(), G, -np.full(6, 7.0), np.full(6, 7.0)))
    sp = build_stacked(problem, pad_multiple=8)
    assert sp.nl_G is not None and sp.risk_soc_rows is not None
    mesh = make_mesh(num_devices=8)
    sp_sharded = shard_problem(sp, mesh)

    rng = np.random.default_rng(3)
    z = jax.tree_util.tree_map(jnp.asarray, random_primal(sp, rng))
    eta = jax.tree_util.tree_map(jnp.asarray, random_dual(sp, rng))
    Lz = ell(sp, z)
    LtEta = ell_t(sp, eta)
    alpha = 0.2
    x0j = jnp.asarray(x0, sp.dtype)

    ref = jax.jit(cp_iteration)(sp, z, eta, Lz, LtEta, alpha, alpha, x0j)
    out = jax.jit(cp_iteration)(
        sp_sharded, shard_variables(z, mesh), shard_variables(eta, mesh),
        shard_variables(Lz, mesh), shard_variables(LtEta, mesh),
        alpha, alpha, x0j)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_sharded_step_matches_with_wasserstein():
    """Wasserstein risks carry c^2 transport-plan auxiliaries in the kernel
    projectors and wide padded y rows (c^2 + 2c + 1): the CP step must stay
    sharded-vs-single-device identical on the 8-device mesh."""
    from raocp_tpu import Wasserstein

    problem, x0 = demo_problem(risk=Wasserstein(0.4))
    sp = build_stacked(problem, pad_multiple=8)
    mesh = make_mesh(num_devices=8)
    sp_sharded = shard_problem(sp, mesh)

    rng = np.random.default_rng(7)
    z = jax.tree_util.tree_map(jnp.asarray, random_primal(sp, rng))
    eta = jax.tree_util.tree_map(jnp.asarray, random_dual(sp, rng))
    Lz = ell(sp, z)
    LtEta = ell_t(sp, eta)
    alpha = 0.2
    x0j = jnp.asarray(x0, sp.dtype)

    ref = jax.jit(cp_iteration)(sp, z, eta, Lz, LtEta, alpha, alpha, x0j)
    out = jax.jit(cp_iteration)(
        sp_sharded, shard_variables(z, mesh), shard_variables(eta, mesh),
        shard_variables(Lz, mesh), shard_variables(LtEta, mesh),
        alpha, alpha, x0j)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_sharded_full_solve_reference_parity():
    """THE multi-device gate: Solver.solve — the entire _run_cp while_loop
    (power iteration, residual checks, history writes) — on the 8-device
    mesh must reproduce the reference's 937-iteration convergence and the
    single-device iterates to near machine precision. A GSPMD miscompile
    or a collective regression anywhere in the loop breaks this."""
    from raocp_tpu.solver import Solver

    problem, x0 = demo_problem()
    mesh = make_mesh(num_devices=8)
    sharded = Solver(problem, mesh=mesh, partition="flat")
    res = sharded.solve(x0, max_iters=2000, tol=1e-3)
    assert res.converged and res.num_iters == 937
    np.testing.assert_allclose(
        res.xi, [9.9508e-4, 9.4106e-4, 9.5599e-4], rtol=1e-3)

    single = Solver(problem, pad_multiple=8).solve(
        x0, max_iters=2000, tol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(res.primal),
                    jax.tree_util.tree_leaves(single.primal)):
        np.testing.assert_allclose(a, b, atol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(res.dual),
                    jax.tree_util.tree_leaves(single.dual)):
        np.testing.assert_allclose(a, b, atol=1e-12)
    np.testing.assert_allclose(res.xi_history, single.xi_history,
                               atol=1e-12)


def test_sharded_production_loop_config():
    """The production configuration (check_every=25, unroll=25 — the
    statically placed residual check) under the mesh: converges past the
    first check after iteration 937 and matches the single-device run."""
    from raocp_tpu.solver import Solver

    problem, x0 = demo_problem()
    mesh = make_mesh(num_devices=8)
    res = Solver(problem, mesh=mesh, partition="flat").solve(
        x0, max_iters=2000, tol=1e-3, check_every=25, unroll=25)
    single = Solver(problem, pad_multiple=8).solve(
        x0, max_iters=2000, tol=1e-3, check_every=25, unroll=25)
    # the residual hovers around 1e-3 just past 937, so the strided run
    # converges at a later multiple of 25 — what matters here is that the
    # sharded loop makes the SAME stopping decisions as the single-device
    # one
    assert res.converged and res.num_iters % 25 == 0
    assert res.num_iters == single.num_iters
    assert float(res.xi.max()) <= 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(res.primal),
                    jax.tree_util.tree_leaves(single.primal)):
        np.testing.assert_allclose(a, b, atol=1e-12)


def test_sharded_relax_adaptive():
    """Over-relaxation + adaptive step balancing (extra carry arithmetic,
    rebalance conds) under the mesh match the single-device run."""
    from raocp_tpu.solver import Solver

    problem, x0 = demo_problem()
    mesh = make_mesh(num_devices=8)
    res = Solver(problem, mesh=mesh, partition="flat").solve(
        x0, max_iters=2000, tol=1e-3, relax=1.5, adaptive=True)
    single = Solver(problem, pad_multiple=8).solve(
        x0, max_iters=2000, tol=1e-3, relax=1.5, adaptive=True)
    assert res.converged and res.num_iters == single.num_iters
    for a, b in zip(jax.tree_util.tree_leaves(res.primal),
                    jax.tree_util.tree_leaves(single.primal)):
        np.testing.assert_allclose(a, b, atol=1e-12)


def test_sharded_loop_collective_budget():
    """Compile-time guard against pathological GSPMD partitioning: the
    sharded production loop body must contain a small, CONSTANT number of
    collectives — the frontier gathers of the operator applies and the
    scalar residual reductions — not O(nodes) or O(leaves^2) resharding
    traffic. A bad sharding annotation typically shows up as dozens of
    all-to-alls / collective-permutes here long before it shows up as a
    slow wall-clock."""
    from functools import partial

    from raocp_tpu.solver import _run_cp

    problem, x0 = demo_problem()
    sp = build_stacked(problem, pad_multiple=8)
    mesh = make_mesh(num_devices=8)
    sp_sh = shard_problem(sp, mesh)
    z0 = shard_variables(sp.zero_primal(), mesh)
    eta0 = shard_variables(sp.zero_dual(), mesh)
    a = jnp.asarray(0.1, sp.dtype)
    hlo = (
        jax.jit(partial(_run_cp, max_iters=100, check_every=25, unroll=25))
        .lower(sp_sh, tuple(z0), tuple(eta0), jnp.asarray(x0, sp.dtype),
               a, a, jnp.asarray(0.0, sp.dtype))
        .compile().as_text())
    counts = {name: hlo.count(f" {name}(")
              for name in ("all-reduce", "all-gather", "all-to-all",
                           "collective-permute", "reduce-scatter")}
    total = sum(counts.values())
    # Measured today: ~3.5k collectives per 25-step trip (~140/iteration:
    # 88 collective-permutes + 33 all-gathers + 12 all-to-alls + 6
    # all-reduces) — the price of flat node-axis sharding whose shard
    # boundaries don't align with the stage slices the DP sweeps take, so
    # GSPMD reshards around every stage. This guard pins the level; the
    # optimization target is stage-aligned sharding (pad each stage to a
    # device-count multiple so stage slices are evenly sharded and the
    # child gathers of a uniformly branched tree become shard-local).
    assert 0 < total < 5000, counts
