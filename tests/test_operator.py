"""Adjointness tests for the L / L' operator pair.

Mirrors the reference strategy (tests/test_operators.py): fill individual
primal/dual segment pairs with Gaussians and assert <Lz, eta> = <z, L'eta>,
then the whole-operator identity — here exhaustively over every
(primal-field, dual-field) pair, which subsumes the reference's 13 pairings.
"""

import jax
import numpy as np
import pytest

from raocp_tpu.core.stacked import build_stacked
from raocp_tpu.core.variables import Dual, Primal, tree_dot
from raocp_tpu.models import demo_problem, lqr_binary_problem, \
    mass_spring_problem
from raocp_tpu.ops.operator import ell, ell_t

from util import random_dual, random_primal


@pytest.fixture(scope="module", params=["demo", "lqr", "spring"])
def sp(request):
    problem = {
        "demo": lambda: demo_problem(),
        "lqr": lambda: lqr_binary_problem(),
        "spring": lambda: mass_spring_problem(num_masses=2, num_stages=4),
    }[request.param]()[0]
    return build_stacked(problem)


def _zero_like(tree):
    return jax.tree_util.tree_map(np.zeros_like, tree)


def test_whole_operator_adjoint(sp):
    rng = np.random.default_rng(0)
    for trial in range(5):
        z = random_primal(sp, rng)
        eta = random_dual(sp, rng)
        lhs = float(tree_dot(ell(sp, z), eta))
        rhs = float(tree_dot(z, ell_t(sp, eta)))
        assert lhs == pytest.approx(rhs, rel=1e-10, abs=1e-10)


def test_segmentwise_adjoint(sp):
    """Every (primal field, dual field) pairing satisfies the adjoint
    identity — catches sign/index errors localised to one segment."""
    rng = np.random.default_rng(1)
    z_full = random_primal(sp, rng)
    eta_full = random_dual(sp, rng)
    for p_field in Primal._fields:
        z = _zero_like(z_full)._replace(
            **{p_field: getattr(z_full, p_field)})
        for d_field in Dual._fields:
            eta = _zero_like(eta_full)._replace(
                **{d_field: getattr(eta_full, d_field)})
            lhs = float(tree_dot(ell(sp, z), eta))
            rhs = float(tree_dot(z, ell_t(sp, eta)))
            assert lhs == pytest.approx(rhs, rel=1e-9, abs=1e-10), \
                f"adjoint mismatch for primal '{p_field}' vs dual '{d_field}'"


def test_operator_preserves_padding(sp):
    """L and L' must keep padded slots exactly zero."""
    rng = np.random.default_rng(2)
    z = random_primal(sp, rng)
    eta_out = ell(sp, z)
    y_mask = np.asarray(sp.y_mask)
    assert (np.asarray(eta_out.e1) * (1 - y_mask) == 0).all()
    assert np.asarray(eta_out.e3)[0] == pytest.approx(0)
    assert np.asarray(eta_out.e5)[0] == 0

    eta = random_dual(sp, rng)
    z_out = ell_t(sp, eta)
    assert (np.asarray(z_out.y) * (1 - y_mask) == 0).all()
    assert np.asarray(z_out.tau)[0] == 0


def test_ell_matches_manual_computation(sp):
    """Spot-check L against a direct per-node numpy evaluation."""
    rng = np.random.default_rng(3)
    z = random_primal(sp, rng)
    eta = jax.tree_util.tree_map(np.asarray, ell(sp, z))
    b_pad = np.asarray(sp.b_pad)
    sqrtQ = np.asarray(sp.sqrtQ.dense())
    sqrtR = np.asarray(sp.sqrtR.dense())
    anc = np.asarray(sp.anc)
    for i in range(sp.num_nonleaf):
        assert eta.e2[i] == pytest.approx(
            z.s[i] - b_pad[i] @ z.y[i], rel=1e-12)
    for j in range(1, sp.num_nodes):
        np.testing.assert_allclose(eta.e3[j], sqrtQ[j] @ z.x[anc[j]],
                                   atol=1e-12)
        np.testing.assert_allclose(eta.e4[j], sqrtR[j] @ z.u[anc[j]],
                                   atol=1e-12)
        assert eta.e5[j] == pytest.approx(0.5 * z.tau[j])
    for ell_idx in range(sp.num_leaf):
        node = sp.num_nonleaf + ell_idx
        np.testing.assert_allclose(
            eta.e11[ell_idx],
            np.asarray(sp.sqrtP.dense())[ell_idx] @ z.x[node], atol=1e-12)
        assert eta.e12[ell_idx] == pytest.approx(0.5 * z.s[node])


def test_flat_linops_scipy_interop(sp):
    """The flat matvec/rmatvec wrappers (reference operators.py:96-109
    analogue) plug into scipy's LinearOperator, and Arnoldi eigs on L'L
    agrees with the solver's on-device power iteration."""
    from scipy.sparse.linalg import LinearOperator, eigs

    from raocp_tpu.ops.operator import flat_linops
    from raocp_tpu.solver import _power_iteration

    mv, rmv, np_dim, nd_dim = flat_linops(sp)
    L = LinearOperator((nd_dim, np_dim), matvec=mv, rmatvec=rmv)
    LtL = LinearOperator((np_dim, np_dim),
                         matvec=lambda v: rmv(mv(v)))
    lam_arnoldi = float(np.real(eigs(LtL, k=1, which="LM",
                                     return_eigenvectors=False)[0]))
    lam_power, _ = _power_iteration(sp)
    assert float(lam_power) == pytest.approx(lam_arnoldi, rel=1e-8)
    # adjoint identity through the flat wrappers
    rng = np.random.default_rng(4)
    v = rng.standard_normal(np_dim)
    w = rng.standard_normal(nd_dim)
    assert float(mv(v) @ w) == pytest.approx(float(v @ rmv(w)), rel=1e-10)
