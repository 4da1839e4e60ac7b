"""Oracle tests for the proximal maps.

The dynamics projection is cross-validated against an exact dense
least-squares oracle (the reference validates against cvxpy,
tests/test_cache.py:111-159 — the dense oracle is the same QP solved in
closed form). The kernel projection is cross-validated against a
scipy-null-space + lstsq oracle (reference tests/test_cache.py:161-209), and
prox_g* against an independent per-node host implementation built on the
spec-level cone classes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raocp_tpu.core.stacked import build_stacked
from raocp_tpu.core.variables import Dual
from raocp_tpu.models import demo_problem, lqr_binary_problem, \
    random_network_problem, soc_network_problem
from raocp_tpu.ops.prox import (project_dynamics, project_kernel, prox_f,
                                prox_g_conj)
from raocp_tpu.core.constraints.cones import SecondOrderCone

from util import (dynamics_projection_oracle, kernel_projection_oracle,
                  random_dual, random_primal)


@pytest.fixture(scope="module", params=["demo", "lqr", "network", "socnet"])
def spec_and_sp(request):
    problem = {
        "demo": lambda: demo_problem(),
        "lqr": lambda: lqr_binary_problem(),
        "network": lambda: random_network_problem(
            num_states=5, num_inputs=2, num_modes=3, num_stages=5,
            stopping_time=3),
        "socnet": lambda: soc_network_problem(
            num_states=5, num_inputs=2, num_modes=3, num_stages=5,
            stopping_time=3),
    }[request.param]()[0]
    return problem, build_stacked(problem)


def test_dynamics_projection_matches_dense_oracle(spec_and_sp):
    spec, sp = spec_and_sp
    rng = np.random.default_rng(0)
    x_hat = rng.standard_normal((sp.num_nodes, sp.n))
    u_hat = rng.standard_normal((sp.num_nonleaf, sp.m))
    x0 = rng.standard_normal(sp.n)
    x_dp, u_dp = project_dynamics(sp, jnp.asarray(x_hat), jnp.asarray(u_hat),
                                  jnp.asarray(x0))
    x_ref, u_ref = dynamics_projection_oracle(spec, x_hat, u_hat, x0)
    np.testing.assert_allclose(np.asarray(x_dp), x_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(u_dp), u_ref, atol=1e-8)


def test_dynamics_projection_is_feasible_and_idempotent(spec_and_sp):
    spec, sp = spec_and_sp
    tree = spec.tree
    rng = np.random.default_rng(1)
    x_hat = rng.standard_normal((sp.num_nodes, sp.n))
    u_hat = rng.standard_normal((sp.num_nonleaf, sp.m))
    x0 = rng.standard_normal(sp.n)
    x, u = project_dynamics(sp, jnp.asarray(x_hat), jnp.asarray(u_hat),
                            jnp.asarray(x0))
    x, u = np.asarray(x), np.asarray(u)
    np.testing.assert_allclose(x[0], x0, atol=1e-12)
    for j in range(1, sp.num_nodes):
        i = tree.ancestor_of(j)
        np.testing.assert_allclose(
            x[j], spec.state_dynamics_at_node(j) @ x[i]
            + spec.control_dynamics_at_node(j) @ u[i], atol=1e-9)
    # projecting a feasible point is the identity
    x2, u2 = project_dynamics(sp, jnp.asarray(x), jnp.asarray(u),
                              jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-8)
    np.testing.assert_allclose(np.asarray(u2), u, atol=1e-8)


def test_kernel_projection_matches_oracle(spec_and_sp):
    spec, sp = spec_and_sp
    tree = spec.tree
    rng = np.random.default_rng(2)
    z = random_primal(sp, rng)
    y_new, tau_new, s_new = project_kernel(
        sp, jnp.asarray(z.y), jnp.asarray(z.tau), jnp.asarray(z.s))
    y_new, tau_new, s_new = map(np.asarray, (y_new, tau_new, s_new))

    # build the unpadded y per node for the oracle (natural row order:
    # node i's risk rows occupy slots [0, R_i))
    y_unpadded = []
    rows = []
    for i in range(sp.num_nonleaf):
        R = spec.risk_at_node(i).matrix_e.shape[0]
        rows.append(R)
        y_unpadded.append(np.asarray(z.y[i][:R]))
    y_ref, tau_ref, s_ref = kernel_projection_oracle(
        spec, y_unpadded, np.asarray(z.tau), np.asarray(z.s))

    np.testing.assert_allclose(tau_new, tau_ref, atol=1e-9)
    np.testing.assert_allclose(s_new, s_ref, atol=1e-9)
    for i in range(sp.num_nonleaf):
        R = rows[i]
        np.testing.assert_allclose(y_new[i][:R], y_ref[i], atol=1e-9)
        if R < sp.Y:
            assert np.abs(y_new[i][R:]).max() == 0


def test_prox_f_shifts_s0(spec_and_sp):
    _, sp = spec_and_sp
    rng = np.random.default_rng(3)
    z = jax.tree_util.tree_map(jnp.asarray, random_primal(sp, rng))
    alpha = 0.37
    x0 = rng.standard_normal(sp.n)
    out = prox_f(sp, z, alpha, jnp.asarray(x0))
    # s0 is only touched by the shift (the kernel projection reads children)
    assert np.asarray(out.s)[0] == pytest.approx(z.s[0] - alpha, abs=1e-12)


def _prox_g_conj_host(spec, sp, eta: Dual, alpha: float) -> Dual:
    """Independent per-node host implementation following the reference
    algorithm (cache.py:321-393) with the spec-level cone classes."""
    tree = spec.tree
    soc = SecondOrderCone()       # nonleaf SOC (dim n+m+2)
    soc_leaf = SecondOrderCone()  # leaf SOC (dim n+2)
    mod = Dual(*(np.asarray(part) / alpha for part in eta))
    mod = mod._replace(e5=mod.e5 - 0.5, e6=mod.e6 + 0.5,
                       e12=mod.e12 - 0.5, e13=mod.e13 + 0.5)
    proj = Dual(*(np.array(part, copy=True) for part in mod))
    for i in range(sp.num_nonleaf):
        # risk dual cone: NnOC(2c) x Real(1) in the padded layout
        c = len(tree.children_of(i))
        p = np.array(mod.e1[i], copy=True)
        p[:2 * c] = np.maximum(p[:2 * c], 0)
        proj.e1[i] = p
        proj.e2[i] = max(mod.e2[i], 0.0)
        con = spec.nonleaf_constraint_at_node(i)
        if con.is_active:
            proj.e7[i] = con.project(mod.e7[i].reshape(-1, 1)).reshape(-1)
    for j in range(1, sp.num_nodes):
        v = np.concatenate((mod.e3[j], mod.e4[j], [mod.e5[j]], [mod.e6[j]]))
        pv = soc.project(v)
        n, m = sp.n, sp.m
        proj.e3[j] = pv[:n]
        proj.e4[j] = pv[n:n + m]
        proj.e5[j] = pv[n + m]
        proj.e6[j] = pv[n + m + 1]
    for li in range(sp.num_leaf):
        node = sp.num_nonleaf + li
        v = np.concatenate((mod.e11[li], [mod.e12[li]], [mod.e13[li]]))
        pv = soc_leaf.project(v)
        proj.e11[li] = pv[:sp.n]
        proj.e12[li] = pv[sp.n]
        proj.e13[li] = pv[sp.n + 1]
        con = spec.leaf_constraint_at_node(node)
        if con.is_active:
            proj.e14[li] = con.project(mod.e14[li].reshape(-1, 1)).reshape(-1)
    return Dual(*(alpha * (mp - pp) for mp, pp in zip(mod, proj)))


def test_prox_g_conj_matches_host_oracle(spec_and_sp):
    spec, sp = spec_and_sp
    rng = np.random.default_rng(4)
    eta = random_dual(sp, rng)
    alpha = 0.21
    out = prox_g_conj(sp, eta, alpha)
    ref = _prox_g_conj_host(spec, sp, eta, alpha)
    for name in Dual._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), getattr(ref, name), atol=1e-10,
            err_msg=f"prox_g* mismatch in {name}")
