"""Polyhedral constraints (general ``lb <= G v <= ub``).

The reference's constraint base class stores Gamma_x / Gamma_u matrices
(``base_constraint.py:88-98``) but only ever instantiates stacked identities
(Rectangle); Polyhedral delivers the general case. Covered here:

* adjointness of the G-structured constraint rows of L / L',
* exact equivalence with Rectangle when G = I (same iterates, same count),
* end-to-end convergence + feasibility with a genuinely non-axis-aligned
  (diamond) constraint set, checked against the box-constrained solution,
* the host-side Dykstra projection oracle (variational inequality),
* builder/validation errors.
"""

import numpy as np
import pytest

from raocp_tpu import Polyhedral, Rectangle, Solver
from raocp_tpu.core.elements import Leaf, Nonleaf
from raocp_tpu.core.stacked import build_stacked
from raocp_tpu.core.variables import tree_dot
from raocp_tpu.models import demo_problem, lqr_binary_problem
from raocp_tpu.ops.operator import ell, ell_t

from util import random_dual, random_primal


def _poly_demo_problem():
    """Demo problem with random general row matrices on both node classes."""
    problem, x0 = demo_problem()
    rng = np.random.default_rng(7)
    n, m = 3, 2
    G_nl = rng.standard_normal((4, n + m))
    G_lf = rng.standard_normal((2, n))
    nl_con = Polyhedral(Nonleaf(), G_nl, -np.ones(4), np.ones(4))
    lf_con = Polyhedral(Leaf(), G_lf, [None, -2.0], [1.0, 2.0])
    problem.with_all_nonleaf_constraints(nl_con)
    problem.with_all_leaf_constraints(lf_con)
    return problem, x0


def test_polyhedral_rows_adjoint():
    problem, _ = _poly_demo_problem()
    sp = build_stacked(problem)
    assert sp.nl_G is not None and sp.l_G is not None
    assert sp.nl_rows == 4 and sp.l_rows == 2
    rng = np.random.default_rng(0)
    for _ in range(5):
        z = random_primal(sp, rng)
        eta = random_dual(sp, rng)
        lhs = float(tree_dot(ell(sp, z), eta))
        rhs = float(tree_dot(z, ell_t(sp, eta)))
        assert lhs == pytest.approx(rhs, rel=1e-12, abs=1e-12)


def test_identity_polyhedral_matches_rectangle():
    """G = I Polyhedral is algebraically identical to Rectangle — the CP
    iterate sequence (and so the iteration count) must match exactly."""
    box_problem, x0 = lqr_binary_problem()
    box = Solver(box_problem).solve(x0, max_iters=5000, tol=1e-4)

    poly_problem, _ = lqr_binary_problem()
    poly_problem.with_all_nonleaf_constraints(
        Polyhedral(Nonleaf(), np.eye(3), -np.ones(3), np.ones(3)))
    poly_problem.with_all_leaf_constraints(
        Polyhedral(Leaf(), np.eye(2), -np.ones(2), np.ones(2)))
    poly = Solver(poly_problem).solve(x0, max_iters=5000, tol=1e-4)

    assert poly.num_iters == box.num_iters
    np.testing.assert_allclose(poly.xi, box.xi, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(poly.primal.x),
                               np.asarray(box.primal.x), atol=1e-12)


def test_general_rows_bind_and_converge():
    """A non-axis-aligned polyhedron the identity rows cannot express: the
    mixed state-input row x_1 - x_2 + u bounded at 0.9 (the box-only
    solution drives it to ~1.15, so the general row genuinely binds), plus
    a loose diamond face and the input box."""
    G = np.array([[1.0, -1.0, 1.0],
                  [1.0, 1.0, 0.0],
                  [0.0, 0.0, 1.0]])
    lo = np.array([-0.9, -1.0, -1.0])
    hi = np.array([0.9, 1.0, 1.0])

    box_problem, x0 = lqr_binary_problem(num_stages=4)
    box = Solver(box_problem).solve(x0, max_iters=20000, tol=1e-5)

    problem, _ = lqr_binary_problem(num_stages=4)
    problem.with_all_nonleaf_constraints(Polyhedral(Nonleaf(), G, lo, hi))
    solver = Solver(problem)
    res = solver.solve(x0, max_iters=20000, tol=1e-5)
    assert res.converged

    v = solver.validate(res)
    assert v["dynamics"] < 1e-6
    assert v["constraints"] < 1e-4

    # the mixed row really binds: the polyhedral solution obeys it (up to
    # the residual tolerance) while the box-only solution violates it
    NL = problem.tree.num_nonleaf_nodes
    def row0(r_):
        xu = np.concatenate([np.asarray(r_.primal.x)[:NL],
                             np.asarray(r_.primal.u)[:NL]], axis=1)
        return xu @ G[0]
    assert row0(res).max() <= 0.9 + 1e-3
    assert row0(box).max() > 1.1


def test_dykstra_projection_oracle():
    rng = np.random.default_rng(3)
    G = rng.standard_normal((3, 4))
    con = Polyhedral(Nonleaf(), G, -np.ones(3), np.ones(3)).bind(2, 2)
    points = rng.standard_normal((6, 4)) * 3.0
    projections = [con.project(p) for p in points]
    for p, proj in zip(points, projections):
        assert con.violation(proj) < 1e-8
        # variational inequality <v - Pv, w - Pv> <= 0 for feasible w
        for w in projections:
            assert float((p - proj) @ (w - proj)) <= 1e-8
    # feasible points are fixed
    inside = projections[0]
    np.testing.assert_allclose(con.project(inside), inside, atol=1e-9)


def test_polyhedral_validation_errors():
    with pytest.raises(ValueError, match="bounds must have one entry"):
        Polyhedral(Nonleaf(), np.eye(3), -np.ones(2), np.ones(3))
    with pytest.raises(ValueError, match="both bounds None"):
        Polyhedral(Nonleaf(), np.eye(2), [None, -1.0], [None, 1.0])
    with pytest.raises(ValueError, match="lower bound exceeds"):
        Polyhedral(Nonleaf(), np.eye(2), np.ones(2), -np.ones(2))
    problem, _ = lqr_binary_problem()
    with pytest.raises(ValueError, match="columns"):
        problem.with_all_nonleaf_constraints(
            Polyhedral(Nonleaf(), np.eye(4), -np.ones(4), np.ones(4)))


def test_polyhedral_reference_gamma_surface():
    """The reference-compatible Gamma accessors expose the real row blocks."""
    G = np.arange(12.0).reshape(3, 4)
    con = Polyhedral(Nonleaf(), G, -np.ones(3), np.ones(3)).bind(3, 1)
    np.testing.assert_array_equal(con.state_matrix, G[:, :3])
    np.testing.assert_array_equal(con.control_matrix, G[:, 3:])
    np.testing.assert_array_equal(con.state_matrix_transposed, G[:, :3].T)
