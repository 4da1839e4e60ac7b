"""Tests for the generic conic-risk layer: TotalVariation, ConicRisk, and
the per-node row-kind dual projections.

The reference hardwires AVaR (``risks.py:5``); its conic machinery
(E, F, K, b ambiguity sets, ``cache.py:235-247``) is risk-agnostic. These
tests exercise that generality end-to-end: a risk with a nonzero F matrix
(auxiliary variables), non-AVaR row layouts, and cross-checks against
independent oracles (greedy LP solution, expectation/worst-case limits).
"""

import numpy as np
import pytest
import scipy.optimize

from raocp_tpu.core.elements import (AVaR, ConicForm, ConicRisk,
                                     TotalVariation, avar_conic_form,
                                     tv_conic_form)
from raocp_tpu.core.stacked import build_stacked
from raocp_tpu.models import demo_problem

RNG = np.random.default_rng(7)


def _max_over_conic_form(form: ConicForm, z: np.ndarray) -> float:
    """max_mu { z'mu : exists nu, b - E mu - F nu in K } via scipy linprog.

    K rows are read from the cone components (NnOC -> inequality,
    Zero -> equality)."""
    import raocp_tpu.core.constraints.cones as cones

    E, F, b = form.matrix_e, form.matrix_f, form.vector_b.reshape(-1)
    c, w = E.shape[1], F.shape[1]
    kinds = []
    for comp in form.cone.cones:
        tag = {cones.NonnegativeOrthant: "ub", cones.Zero: "eq"}[type(comp)]
        kinds.extend([tag] * comp.dimension)
    kinds = np.asarray(kinds)
    G = np.hstack([E, F])
    ub = kinds == "ub"
    res = scipy.optimize.linprog(
        c=-np.concatenate([z, np.zeros(w)]),
        A_ub=G[ub], b_ub=b[ub],
        A_eq=G[~ub], b_eq=b[~ub],
        bounds=[(None, None)] * (c + w), method="highs")
    assert res.success, res.message
    return -res.fun


def _tv_robust_expectation(z, pi, radius) -> float:
    """Greedy (exact) solution of max { mu'z : mu in simplex,
    ||mu - pi||_1 <= radius }: transport up to radius/2 mass from the
    lowest-z entries to the single highest-z entry."""
    z = np.asarray(z, dtype=float)
    pi = np.asarray(pi, dtype=float)
    imax = int(np.argmax(z))
    eps = min(radius / 2.0, 1.0 - pi[imax])
    mu = pi.copy()
    mu[imax] += eps
    take = eps
    for j in np.argsort(z):
        if j == imax or take <= 0:
            continue
        give = min(mu[j], take)
        mu[j] -= give
        take -= give
    return float(mu @ z)


def test_tv_conic_form_shapes_and_membership():
    pi = np.array([0.2, 0.5, 0.3])
    r = 0.4
    form = tv_conic_form(r, pi)
    c = 3
    assert form.matrix_e.shape == (3 * c + 2, c)
    assert form.matrix_f.shape == (3 * c + 2, c)
    assert form.vector_b.shape == (3 * c + 2, 1)

    def member(mu):
        """mu in the set iff some t satisfies all rows; take t = |mu - pi|."""
        t = np.abs(mu - pi)
        resid = form.vector_b.reshape(-1) - form.matrix_e @ mu \
            - form.matrix_f @ t
        return (resid[:-1] >= -1e-9).all() and abs(resid[-1]) < 1e-9

    assert member(pi)                                  # center
    assert member(np.array([0.2 + 0.2, 0.5 - 0.2, 0.3]))   # on the ball
    assert not member(np.array([0.2 + 0.3, 0.5 - 0.3, 0.3]))  # outside ball
    assert not member(np.array([0.3, 0.5, 0.3]))       # off the simplex


def test_tv_conic_form_matches_greedy_lp():
    """The LP over the conic form equals the greedy transport solution."""
    for c in (2, 3, 5):
        pi = RNG.random(c) + 0.05
        pi /= pi.sum()
        for r in (0.0, 0.15, 0.6, 2.0):
            form = tv_conic_form(r, pi)
            for _ in range(5):
                z = RNG.standard_normal(c)
                lp = _max_over_conic_form(form, z)
                greedy = _tv_robust_expectation(z, pi, r)
                assert lp == pytest.approx(greedy, abs=1e-8)


def test_tv_limits_match_avar_limits():
    """radius 0 -> expectation (= AVaR(1)); radius >= 2 -> worst case
    (= AVaR(0)) — checked through the conic-form LPs."""
    pi = np.array([0.25, 0.4, 0.35])
    for _ in range(5):
        z = RNG.standard_normal(3)
        e_tv0 = _max_over_conic_form(tv_conic_form(0.0, pi), z)
        e_av1 = _max_over_conic_form(avar_conic_form(1.0, pi), z)
        assert e_tv0 == pytest.approx(float(pi @ z), abs=1e-8)
        assert e_av1 == pytest.approx(float(pi @ z), abs=1e-8)
        w_tv = _max_over_conic_form(tv_conic_form(2.0, pi), z)
        w_av = _max_over_conic_form(avar_conic_form(0.0, pi), z)
        assert w_tv == pytest.approx(float(z.max()), abs=1e-8)
        assert w_av == pytest.approx(float(z.max()), abs=1e-8)


def test_tv_validation():
    with pytest.raises(ValueError):
        TotalVariation(-0.1)
    risk = TotalVariation(0.3)
    with pytest.raises(ValueError):
        _ = risk.matrix_e          # not realized yet
    realized = risk.for_children([0.5, 0.5])
    assert realized.matrix_e.shape == (8, 2)
    assert risk.probs is None      # for_children copies


def test_conic_risk_reproduces_avar():
    """A ConicRisk wrapping avar_conic_form must stack identically to AVaR."""
    problem_a, _ = demo_problem()
    problem_c, _ = demo_problem(
        risk=ConicRisk(lambda pi: avar_conic_form(0.95, pi)))
    sa = build_stacked(problem_a)
    sc = build_stacked(problem_c)
    assert sa.Y == sc.Y and sa.D == sc.D
    np.testing.assert_allclose(np.asarray(sa.b_pad), np.asarray(sc.b_pad))
    np.testing.assert_allclose(np.asarray(sa.Pi), np.asarray(sc.Pi))
    np.testing.assert_array_equal(np.asarray(sa.risk_free_rows),
                                  np.asarray(sc.risk_free_rows))


def test_conic_risk_validation():
    with pytest.raises(ValueError):
        ConicRisk("not callable")
    bad_rows = ConicRisk(lambda pi: ConicForm(
        np.ones((3, pi.size)), np.ones((2, 0)), None, np.ones((3, 1))))
    with pytest.raises(ValueError):
        bad_rows.probs = [0.5, 0.5]
    not_form = ConicRisk(lambda pi: "nope")
    with pytest.raises(TypeError):
        not_form.probs = [0.5, 0.5]


def test_multiple_soc_blocks_rejected():
    """A risk cone may carry at most ONE SecondOrderCone block (the batched
    dual projection does one joint block projection per node)."""
    import raocp_tpu.core.constraints.cones as cones

    def two_soc_form(pi):
        c = pi.size
        rows = 2 * (c + 1)
        return ConicForm(np.zeros((rows, c)), np.empty((rows, 0)),
                         cones.Cartesian(
                             [cones.SecondOrderCone(dimension=c + 1),
                              cones.SecondOrderCone(dimension=c + 1)]),
                         np.ones((rows, 1)))

    problem, _ = demo_problem(risk=ConicRisk(two_soc_form))
    with pytest.raises(NotImplementedError):
        build_stacked(problem)


@pytest.fixture(scope="module")
def tv_spec_and_sp():
    problem, _ = demo_problem(risk=TotalVariation(0.5))
    return problem, build_stacked(problem)


def test_tv_stacked_layout(tv_spec_and_sp):
    spec, sp = tv_spec_and_sp
    tree = spec.tree
    d = tree.max_branching
    assert sp.Y == 3 * d + 2
    assert sp.D == sp.Y + 2 * d
    b_pad = np.asarray(sp.b_pad)
    free = np.asarray(sp.risk_free_rows)
    for i in range(sp.num_nonleaf):
        c = len(tree.children_of(i))
        R = 3 * c + 2
        b = spec.risk_at_node(i).vector_b.reshape(-1)
        np.testing.assert_allclose(b_pad[i, :R], b)
        assert (b_pad[i, R:] == 0).all()
        # the single Zero row (1'mu = 1) is the last real row
        assert free[i, R - 1] and free[i].sum() == 1


def test_tv_operator_adjoint(tv_spec_and_sp):
    """<L z, eta> = <z, L' eta> with the wider TV dual layout."""
    import jax
    import jax.numpy as jnp

    from raocp_tpu.ops.operator import ell, ell_t
    from util import random_dual, random_primal, tree_dot_np

    _, sp = tv_spec_and_sp
    rng = np.random.default_rng(11)
    z = random_primal(sp, rng)
    eta = random_dual(sp, rng)
    zj = jax.tree_util.tree_map(jnp.asarray, z)
    ej = jax.tree_util.tree_map(jnp.asarray, eta)
    lhs = tree_dot_np(ell(sp, zj), eta)
    rhs = tree_dot_np(z, ell_t(sp, ej))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_tv_kernel_projection_matches_oracle(tv_spec_and_sp):
    """The precomputed-projector kernel projection equals the null-space
    lstsq oracle on a problem whose risk has a nonzero F matrix."""
    import jax.numpy as jnp

    from raocp_tpu.ops.prox import project_kernel
    from util import kernel_projection_oracle, random_primal

    spec, sp = tv_spec_and_sp
    rng = np.random.default_rng(12)
    z = random_primal(sp, rng)
    y_new, tau_new, s_new = project_kernel(
        sp, jnp.asarray(z.y), jnp.asarray(z.tau), jnp.asarray(z.s))
    y_new, tau_new, s_new = map(np.asarray, (y_new, tau_new, s_new))
    rows = [spec.risk_at_node(i).matrix_e.shape[0]
            for i in range(sp.num_nonleaf)]
    y_unpadded = [np.asarray(z.y[i][:rows[i]])
                  for i in range(sp.num_nonleaf)]
    y_ref, tau_ref, s_ref = kernel_projection_oracle(
        spec, y_unpadded, np.asarray(z.tau), np.asarray(z.s))
    np.testing.assert_allclose(tau_new, tau_ref, atol=1e-9)
    np.testing.assert_allclose(s_new, s_ref, atol=1e-9)
    for i in range(sp.num_nonleaf):
        np.testing.assert_allclose(y_new[i][:rows[i]], y_ref[i], atol=1e-9)
        if rows[i] < sp.Y:
            assert np.abs(y_new[i][rows[i]:]).max() == 0


def test_tv_solve_end_to_end():
    """TV-risk demo problem: converges; the solution is dynamics- and
    kernel-feasible; risk-neutral (radius 0) and AVaR(1) solves coincide
    (both are the expectation), and tightening the radius is monotone in
    the risk-averse direction (not cheaper than risk-neutral)."""
    from raocp_tpu.solver import Solver

    problem_tv, x0 = demo_problem(risk=TotalVariation(0.5))
    solver = Solver(problem_tv)
    res = solver.solve(x0, max_iters=6000, tol=1e-3)
    assert res.converged
    checks = solver.validate()
    assert checks["dynamics"] < 1e-8
    assert checks["kernel"] < 1e-8

    problem_0, _ = demo_problem(risk=TotalVariation(0.0))
    problem_e, _ = demo_problem(risk=AVaR(1.0))
    res_0 = Solver(problem_0).solve(x0, max_iters=6000, tol=1e-4)
    res_e = Solver(problem_e).solve(x0, max_iters=6000, tol=1e-4)
    assert res_0.converged and res_e.converged
    np.testing.assert_allclose(np.asarray(res_0.primal.x),
                               np.asarray(res_e.primal.x), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res_0.primal.u),
                               np.asarray(res_e.primal.u), atol=2e-3)


def test_risk_evaluate_api():
    """risk.evaluate(z) (the library's LP) agrees with the test-local LP
    and the greedy TV oracle; AVaR limits sanity-check it too."""
    pi = np.array([0.3, 0.45, 0.25])
    tv = TotalVariation(0.4).for_children(pi)
    av = AVaR(0.95).for_children(pi)
    for _ in range(5):
        z = RNG.standard_normal(3)
        assert tv.evaluate(z) == pytest.approx(
            _tv_robust_expectation(z, pi, 0.4), abs=1e-8)
        assert tv.evaluate(z) == pytest.approx(
            _max_over_conic_form(tv_conic_form(0.4, pi), z), abs=1e-8)
        assert av.evaluate(z) == pytest.approx(
            _max_over_conic_form(avar_conic_form(0.95, pi), z), abs=1e-8)
    assert AVaR(1.0).for_children(pi).evaluate(z) == pytest.approx(
        float(pi @ z), abs=1e-9)
    assert AVaR(0.0).for_children(pi).evaluate(z) == pytest.approx(
        float(z.max()), abs=1e-9)


def _msd_closed_form(z, pi, beta) -> float:
    """Closed-form mean-upper-semideviation: E[Z] + beta E[(Z - E[Z])_+]."""
    z = np.asarray(z, dtype=float)
    mean = float(pi @ z)
    return mean + beta * float(pi @ np.maximum(z - mean, 0.0))


def test_msd_conic_form_matches_closed_form():
    """The LP over the MSD ambiguity set equals the closed form, and the
    library evaluate() agrees; beta = 0 is the expectation."""
    from raocp_tpu.core.elements import (MeanUpperSemideviation,
                                         msd_conic_form)

    for c in (2, 3, 5):
        pi = RNG.random(c) + 0.05
        pi /= pi.sum()
        for beta in (0.0, 0.3, 1.0):
            form = msd_conic_form(beta, pi)
            risk = MeanUpperSemideviation(beta).for_children(pi)
            for _ in range(5):
                z = RNG.standard_normal(c)
                want = _msd_closed_form(z, pi, beta)
                assert _max_over_conic_form(form, z) == pytest.approx(
                    want, abs=1e-8)
                assert risk.evaluate(z) == pytest.approx(want, abs=1e-8)
    with pytest.raises(ValueError):
        MeanUpperSemideviation(1.5)


def test_msd_solve_end_to_end():
    """MSD-risk demo: converges, feasible, objective matches the
    independent risk recursion, and beta = 0 coincides with AVaR(1)
    (both are the expectation)."""
    from raocp_tpu import MeanUpperSemideviation
    from raocp_tpu.solver import Solver
    from raocp_tpu.utils.evaluate import risk_value

    problem, x0 = demo_problem(risk=MeanUpperSemideviation(0.6))
    solver = Solver(problem)
    res = solver.solve(x0, max_iters=8000, tol=1e-4)
    assert res.converged
    checks = solver.validate()
    assert checks["dynamics"] < 1e-8 and checks["kernel"] < 1e-8
    v0 = risk_value(problem, res.primal.x, res.primal.u)
    assert res.objective == pytest.approx(v0, abs=2e-2, rel=1e-2)

    problem_0, _ = demo_problem(risk=MeanUpperSemideviation(0.0))
    problem_e, _ = demo_problem(risk=AVaR(1.0))
    res_0 = Solver(problem_0).solve(x0, max_iters=6000, tol=1e-4)
    res_e = Solver(problem_e).solve(x0, max_iters=6000, tol=1e-4)
    assert res_0.converged and res_e.converged
    np.testing.assert_allclose(np.asarray(res_0.primal.x),
                               np.asarray(res_e.primal.x), atol=2e-3)


# ---------------------------------------------------------------------------
# L2Ball: the SOC-cone risk (Euclidean-ball distributionally robust
# expectation) — the first non-polyhedral ambiguity set
# ---------------------------------------------------------------------------

def test_l2ball_evaluation_limits_and_brute_force():
    from raocp_tpu.core.elements import L2Ball

    pi = np.array([0.2, 0.5, 0.3])
    z = np.array([1.0, 3.0, 2.0])
    # radius 0: the expectation; radius >= sqrt(2): the whole simplex
    assert L2Ball(0.0).for_children(pi).evaluate(z) == \
        pytest.approx(float(pi @ z), abs=1e-8)
    assert L2Ball(2.0).for_children(pi).evaluate(z) == \
        pytest.approx(z.max(), abs=1e-6)
    # small radius (nonnegativity slack): the optimum is analytic —
    # mu* = pi + r P z / ||P z|| with P the simplex-hyperplane projector,
    # so rho = pi'z + r ||P z||
    r = 0.1
    val = L2Ball(r).for_children(pi).evaluate(z)
    Pz = z - z.mean()
    assert val == pytest.approx(float(pi @ z) + r * np.linalg.norm(Pz),
                                abs=1e-7)
    # monotone in the radius, above the expectation
    val3 = L2Ball(0.3).for_children(pi).evaluate(z)
    assert float(pi @ z) <= val <= val3 <= z.max()


def test_l2ball_conic_form_membership():
    from raocp_tpu.core.elements import l2ball_conic_form
    import raocp_tpu.core.constraints.cones as cones

    pi = np.array([0.4, 0.6])
    form = l2ball_conic_form(0.25, pi)
    assert form.matrix_e.shape == (2 * 2 + 2, 2)
    assert form.matrix_f.shape == (2 * 2 + 2, 0)
    comps = form.cone.cones
    assert isinstance(comps[-1], cones.SecondOrderCone)
    assert comps[-1].dimension == 3

    def member(mu):
        s = form.vector_b.reshape(-1) - form.matrix_e @ mu
        return (s[:2] >= -1e-12).all() and abs(s[2]) < 1e-12 \
            and np.linalg.norm(s[3:5]) <= s[5] + 1e-12

    assert member(pi)
    assert member(pi + np.array([0.1, -0.1]))
    assert not member(pi + np.array([0.3, -0.3]))     # leaves the ball
    assert not member(np.array([0.5, 0.4]))           # leaves the simplex


def test_l2ball_validation():
    from raocp_tpu.core.elements import L2Ball

    with pytest.raises(ValueError, match="nonnegative"):
        L2Ball(-0.1)
    risk = L2Ball(0.3)
    with pytest.raises(ValueError, match="realized"):
        risk.matrix_e


@pytest.fixture(scope="module")
def l2_spec_and_sp():
    from raocp_tpu.core.elements import L2Ball

    problem, _ = demo_problem(risk=L2Ball(0.3))
    return problem, build_stacked(problem)


def test_l2ball_stacked_layout(l2_spec_and_sp):
    spec, sp = l2_spec_and_sp
    tree = spec.tree
    d = tree.max_branching
    assert sp.Y == 2 * d + 2
    assert sp.risk_soc_rows is not None
    soc = np.asarray(sp.risk_soc_rows)
    tail = np.asarray(sp.risk_soc_tail)
    free = np.asarray(sp.risk_free_rows)
    for i in range(sp.num_nonleaf):
        c = len(tree.children_of(i))
        R = 2 * c + 2
        # rows: NnOC(c), Zero(1), SOC members (c), SOC radial (1)
        assert free[i, c] and free[i].sum() == 1
        assert soc[i, c + 1:R - 1].all() and soc[i].sum() == c
        assert tail[i, R - 1] and tail[i].sum() == 1


def test_l2ball_operator_adjoint(l2_spec_and_sp):
    import jax
    import jax.numpy as jnp

    from raocp_tpu.ops.operator import ell, ell_t
    from util import random_dual, random_primal, tree_dot_np

    _, sp = l2_spec_and_sp
    rng = np.random.default_rng(21)
    z = random_primal(sp, rng)
    eta = random_dual(sp, rng)
    zj = jax.tree_util.tree_map(jnp.asarray, z)
    ej = jax.tree_util.tree_map(jnp.asarray, eta)
    lhs = tree_dot_np(ell(sp, zj), eta)
    rhs = tree_dot_np(z, ell_t(sp, ej))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_l2ball_dual_projection_matches_host(l2_spec_and_sp):
    """The batched SOC-block dual projection equals a per-node host
    projection with the spec-level cone classes."""
    import jax.numpy as jnp

    from raocp_tpu.ops.cones import risk_dual_project

    def soc_project(vec):
        """Three-case SOC projection for any block size >= 2 (the spec
        class rejects < 3, reference parity; chain nodes here have
        1 child -> a 2-row block)."""
        x, t = vec[:-1], vec[-1]
        nx = np.linalg.norm(x)
        if nx <= t:
            return np.array(vec, copy=True)
        if nx <= -t:
            return np.zeros_like(vec)
        th = 0.5 * (nx + t)
        return np.concatenate([th * x / nx, [th]])

    spec, sp = l2_spec_and_sp
    tree = spec.tree
    rng = np.random.default_rng(5)
    v = rng.standard_normal((sp.nl_pad, sp.Y)) * np.asarray(sp.y_mask)
    out = np.asarray(risk_dual_project(
        jnp.asarray(v), sp.risk_free_rows, sp.risk_zero_rows,
        sp.risk_soc_rows, sp.risk_soc_tail))
    for i in range(sp.num_nonleaf):
        c = len(tree.children_of(i))
        R = 2 * c + 2
        expected = np.zeros(sp.Y)
        expected[:c] = np.maximum(v[i, :c], 0)          # NnOC dual
        expected[c] = v[i, c]                           # Zero dual = R
        expected[c + 1:R] = soc_project(v[i, c + 1:R])
        np.testing.assert_allclose(out[i], expected, atol=1e-12)
    # ghost rows stay zero
    if sp.nl_pad > sp.num_nonleaf:
        assert np.abs(out[sp.num_nonleaf:]).max() == 0


def test_l2ball_solve_end_to_end():
    from raocp_tpu import L2Ball
    from raocp_tpu.solver import Solver
    from raocp_tpu.utils.evaluate import risk_value

    problem, x0 = demo_problem(risk=L2Ball(0.3))
    solver = Solver(problem)
    res = solver.solve(x0, max_iters=8000, tol=1e-4)
    assert res.converged
    checks = solver.validate()
    assert checks["dynamics"] < 1e-8 and checks["kernel"] < 1e-8
    v0 = risk_value(problem, res.primal.x, res.primal.u)
    assert res.objective == pytest.approx(v0, abs=2e-2, rel=1e-2)

    # radius 0 is the expectation: coincides with AVaR(1)
    problem_0, _ = demo_problem(risk=L2Ball(0.0))
    problem_e, _ = demo_problem(risk=AVaR(1.0))
    res_0 = Solver(problem_0).solve(x0, max_iters=6000, tol=1e-4)
    res_e = Solver(problem_e).solve(x0, max_iters=6000, tol=1e-4)
    assert res_0.converged and res_e.converged
    np.testing.assert_allclose(np.asarray(res_0.primal.x),
                               np.asarray(res_e.primal.x), atol=2e-3)


# ---------------------------------------------------------------------------
# Wasserstein: optimal-transport ambiguity sets (flow auxiliaries, F != 0)
# ---------------------------------------------------------------------------

def test_wasserstein_matches_tv_under_discrete_metric():
    """W_1 with the 0/1 ground cost is half the L1 distance, so the
    Wasserstein ball of radius r must equal the TV ball of radius 2r —
    an exact independent oracle of the transport-plan conic form."""
    from raocp_tpu.core.elements import Wasserstein

    pi = np.array([0.5, 0.3, 0.2])
    discrete = 1.0 - np.eye(3)
    for r in (0.0, 0.1, 0.25, 1.0):
        w = Wasserstein(r, ground_cost=discrete).for_children(pi)
        tv = TotalVariation(2 * r).for_children(pi)
        for _ in range(5):
            z = RNG.standard_normal(3)
            assert w.evaluate(z) == pytest.approx(tv.evaluate(z), abs=1e-8)


def test_wasserstein_limits_and_geometry():
    from raocp_tpu.core.elements import Wasserstein

    pi = np.array([0.5, 0.3, 0.2])
    z = np.array([0.0, 1.0, 5.0])
    # radius 0: the nominal expectation; radius >= max cost: worst case
    assert Wasserstein(0.0).for_children(pi).evaluate(z) == \
        pytest.approx(float(pi @ z), abs=1e-9)
    assert Wasserstein(10.0).for_children(pi).evaluate(z) == \
        pytest.approx(float(z.max()), abs=1e-8)
    # geometry: under |i-j| the budget-0.3 adversary moves mass from the
    # NEAR child 1 (cost 1/unit, gain 4/unit -> +1.2); the discrete metric
    # lets it come from anywhere (gain 5/unit from child 0 -> +1.5)
    near = Wasserstein(0.3).for_children(pi).evaluate(z)
    disc = Wasserstein(0.3, ground_cost=1.0 - np.eye(3)).for_children(pi)
    assert near == pytest.approx(float(pi @ z) + 1.2, abs=1e-8)
    assert disc.evaluate(z) == pytest.approx(float(pi @ z) + 1.5, abs=1e-8)


def test_wasserstein_conic_form_membership():
    """Every mu admitted by the conic rows is in the W_1 ball and vice
    versa (checked by solving the transport LP directly)."""
    import scipy.optimize
    from raocp_tpu.core.elements import wasserstein_conic_form

    pi = np.array([0.4, 0.35, 0.25])
    r = 0.5
    form = wasserstein_conic_form(r, None, pi)
    c = 3
    idx = np.arange(c, dtype=float)
    cost = np.abs(idx[:, None] - idx[None, :])

    def w1(mu):
        # min <C, gamma> s.t. gamma >= 0, row sums = pi, col sums = mu
        a_eq = np.concatenate([np.kron(np.eye(c), np.ones((1, c))),
                               np.kron(np.ones((1, c)), np.eye(c))], axis=0)
        b_eq = np.concatenate([pi, mu])
        res = scipy.optimize.linprog(cost.reshape(-1), A_eq=a_eq, b_eq=b_eq,
                                     bounds=[(0, None)] * (c * c),
                                     method="highs")
        return res.fun if res.success else np.inf

    def member(mu):
        # feasibility of the conic rows: exists nu with the NnOC/Zero split
        w = c * c
        res = scipy.optimize.linprog(
            np.zeros(w),
            A_ub=form.matrix_f[:1 + w],
            b_ub=(form.vector_b[:1 + w].reshape(-1)
                  - form.matrix_e[:1 + w] @ mu),
            A_eq=form.matrix_f[1 + w:],
            b_eq=(form.vector_b[1 + w:].reshape(-1)
                  - form.matrix_e[1 + w:] @ mu),
            bounds=[(None, None)] * w, method="highs")
        return res.status == 0

    for _ in range(20):
        d = RNG.standard_normal(3)
        mu = np.abs(d) / np.abs(d).sum()
        assert member(mu) == (w1(mu) <= r + 1e-9)


def test_wasserstein_validation():
    from raocp_tpu.core.elements import Wasserstein

    with pytest.raises(ValueError, match="radius"):
        Wasserstein(-0.1)
    with pytest.raises(ValueError, match="ground_cost"):
        Wasserstein(0.5, ground_cost=np.ones((2, 2))).for_children(
            np.array([0.5, 0.3, 0.2]))
    with pytest.raises(ValueError, match="nonnegative"):
        Wasserstein(0.5, ground_cost=-np.ones((3, 3))).for_children(
            np.array([0.5, 0.3, 0.2]))


def test_wasserstein_solve_end_to_end():
    """Wasserstein-risk demo problem (transport-plan auxiliaries in the
    kernel rows): converges, feasible, and the optimal cost matches the
    independent host-side risk recursion."""
    from raocp_tpu import Wasserstein
    from raocp_tpu.solver import Solver
    from raocp_tpu.utils.evaluate import risk_value

    problem, x0 = demo_problem(risk=Wasserstein(0.4))
    solver = Solver(problem)
    res = solver.solve(x0, max_iters=8000, tol=1e-4)
    assert res.converged
    checks = solver.validate()
    assert checks["dynamics"] < 1e-8
    assert checks["kernel"] < 1e-8
    v0 = risk_value(problem, res.primal.x, res.primal.u)
    assert res.objective == pytest.approx(v0, abs=2e-2, rel=1e-2)


def test_wasserstein_wide_branching_cliff():
    """The documented branching cliff (docs/guide.md "Wasserstein memory"):
    with c children the transport plan adds c^2 auxiliaries, so the risk
    rows are Y = 1 + c^2 + 2c and the kernel-projector stack is
    [NL, D, D] with D = Y + 2c — QUADRATIC in c per dimension, c^4 per
    node in memory. At c = 6 (the first clearly-wide case) this pins the
    layout arithmetic, proves the solve still converges and is feasible,
    and cross-checks the discrete-metric equivalence with TotalVariation
    end-to-end at full width."""
    from raocp_tpu.core.elements import Wasserstein
    from raocp_tpu.core.spec import RAOCP
    from raocp_tpu.core.elements import (Dynamics, Leaf, Nonleaf, Quadratic)
    from raocp_tpu.core.constraints.sets import Rectangle
    from raocp_tpu.core.tree import MarkovChainScenarioTreeFactory
    from raocp_tpu.solver import Solver

    c = 6
    rng = np.random.default_rng(3)
    p = rng.random((c, c)) + 0.2
    p /= p.sum(axis=1, keepdims=True)
    v = np.full(c, 1.0 / c)
    tree = MarkovChainScenarioTreeFactory(p, v, 2, 2).create()
    assert tree.num_nodes == 1 + c + c * c        # 43: fully branched twice

    nl, lf = Nonleaf(), Leaf()
    n, m = 3, 2
    dynamics, costs = [], []
    for _ in range(c):
        A = rng.standard_normal((n, n))
        A *= 0.8 / max(abs(np.linalg.eigvals(A)))
        dynamics.append(Dynamics(A, rng.standard_normal((n, m))))
        costs.append(Quadratic(nl, np.eye(n), 0.1 * np.eye(m)))

    def build(risk):
        return (RAOCP(scenario_tree=tree)
                .with_markovian_dynamics(dynamics)
                .with_markovian_nonleaf_costs(costs)
                .with_all_leaf_costs(Quadratic(lf, np.eye(n)))
                .with_all_risks(risk)
                .with_all_nonleaf_constraints(
                    Rectangle(nl, -10 * np.ones(n + m), 10 * np.ones(n + m)))
                .with_all_leaf_constraints(
                    Rectangle(lf, -10 * np.ones(n), 10 * np.ones(n))))

    r = 0.3
    discrete = 1.0 - np.eye(c)
    problem = build(Wasserstein(r, ground_cost=discrete))
    solver = Solver(problem)
    sp = solver.stacked

    # the cliff arithmetic: Y risk rows and the [NL, D, D] projector stack
    Y = 1 + c * c + 2 * c
    D = Y + 2 * c
    assert sp.Y == Y == 49
    assert sp.Pi.shape[1:] == (D, D) == (61, 61)
    proj_mb = sp.Pi.size * sp.Pi.dtype.itemsize / 1e6
    assert proj_mb < 1.0                          # 7 nonleaf nodes: tiny

    x0 = np.array([1.0, -0.5, 0.5])
    res = solver.solve(x0, max_iters=60000, tol=1e-4)
    assert res.converged
    checks = solver.validate()
    assert checks["dynamics"] < 1e-8 and checks["kernel"] < 1e-8

    # discrete metric radius r == TotalVariation 2r, end-to-end at c = 6
    tv = Solver(build(TotalVariation(2 * r))).solve(
        x0, max_iters=60000, tol=1e-4)
    assert tv.converged
    # finite-tol CP iterates pin the objective much tighter than the
    # (possibly non-unique) trajectory itself
    np.testing.assert_allclose(np.asarray(res.primal.x),
                               np.asarray(tv.primal.x), atol=5e-2)
    assert res.objective == pytest.approx(tv.objective, abs=2e-3)
