"""Builder/validation tests (mirrors reference tests/test_raocp.py,
test_dynamics.py, test_costs.py, test_risks.py, test_rectangle.py,
test_nodes.py, test_no_constraint.py)."""

import numpy as np
import pytest

from raocp_tpu import (AVaR, Dynamics, Leaf, No, Node, Nonleaf, Quadratic,
                       RAOCP, Rectangle, MarkovChainScenarioTreeFactory)


@pytest.fixture(scope="module")
def tree():
    p = np.array([[0.1, 0.8, 0.1], [0.4, 0.6, 0.0], [0.0, 0.3, 0.7]])
    v = np.array([0.5, 0.5, 0.0])
    return MarkovChainScenarioTreeFactory(p, v, 4, 3).create()


def _dynamics():
    A = 0.1 * np.array([[1.0, 2, 1], [1, 1, 2], [2, 1, 1]])
    B = 0.1 * np.array([[1.0, 0], [1, 0], [0, 2]])
    return [Dynamics(0.5 * A, -0.5 * B), Dynamics(A, B),
            Dynamics(-0.5 * A, 0.5 * B)]


def test_node_tags():
    assert not Node().is_nonleaf and not Node().is_leaf
    assert Nonleaf().is_nonleaf and not Nonleaf().is_leaf
    assert Leaf().is_leaf and not Leaf().is_nonleaf


def test_dynamics_shape_validation():
    with pytest.raises(ValueError):
        Dynamics(np.eye(3), np.ones((2, 1)))


def test_quadratic_cost_validation():
    nl, lf = Nonleaf(), Leaf()
    with pytest.raises(Exception):
        Quadratic(nl, np.eye(3))            # missing R on nonleaf
    with pytest.raises(Exception):
        Quadratic(lf, np.eye(3), np.eye(2))  # R given on leaf
    with pytest.raises(Exception):
        Quadratic(nl, np.ones((3, 2)), np.eye(2))  # non-square Q
    with pytest.raises(Exception):
        Quadratic(nl, np.eye(3), np.ones((2, 3)))  # non-square R
    cost = Quadratic(nl, 4.0 * np.eye(3), 9.0 * np.eye(2))
    np.testing.assert_allclose(cost.sqrt_state_weights, 2.0 * np.eye(3))
    np.testing.assert_allclose(cost.sqrt_control_weights, 3.0 * np.eye(2))


def test_avar_validation_and_conic_tuple():
    with pytest.raises(ValueError):
        AVaR(-0.1)
    with pytest.raises(ValueError):
        AVaR(1.5)
    risk = AVaR(0.8)
    risk.probs = np.array([0.3, 0.7])
    E = risk.matrix_e
    np.testing.assert_allclose(E[:2], 0.8 * np.eye(2))
    np.testing.assert_allclose(E[2:4], -np.eye(2))
    np.testing.assert_allclose(E[4], np.ones(2))
    assert risk.matrix_f.shape == (5, 0)
    np.testing.assert_allclose(risk.vector_b.reshape(-1),
                               [0.3, 0.7, 0, 0, 1])
    assert risk.cone.types == "NonnegativeOrthant x Zero"


def test_rectangle_validation():
    nl = Nonleaf()
    with pytest.raises(Exception):
        Rectangle(nl, np.ones(3), -np.ones(3))       # min > max
    with pytest.raises(Exception):
        Rectangle(nl, np.ones(3), np.ones(2))        # size mismatch
    with pytest.raises(Exception):
        Rectangle(nl, np.array([None]), np.array([None]))  # both None
    rect = Rectangle(nl, np.array([None, -1.0]), np.array([2.0, None]))
    assert rect.min[0] == -np.inf and rect.max[1] == np.inf
    rect.state_size = 1
    rect.control_size = 1
    out = rect.project(np.array([[5.0], [-3.0]]))
    np.testing.assert_allclose(out.reshape(-1), [2.0, -1.0])


def test_no_constraint_inactive():
    assert No().is_active is False


def test_markovian_dynamics_requires_markovian_tree():
    from raocp_tpu.core.tree import ScenarioTree
    plain = ScenarioTree(np.array([0, 1, 1]), np.array([-1, 0, 0]),
                         np.array([1.0, 0.5, 0.5]), np.array([-1, 0, 1]),
                         is_markovian=False)
    with pytest.raises(TypeError):
        RAOCP(plain).with_markovian_dynamics(_dynamics())


def test_markovian_dynamics_shape_check(tree):
    bad = _dynamics()
    bad[1] = Dynamics(np.eye(2), np.ones((2, 1)))
    with pytest.raises(ValueError):
        RAOCP(tree).with_markovian_dynamics(bad)


def test_constraints_before_dynamics_raises(tree):
    rect = Rectangle(Nonleaf(), -np.ones(5), np.ones(5))
    with pytest.raises(Exception):
        RAOCP(tree).with_all_nonleaf_constraints(rect)


def test_wrong_node_types_raise(tree):
    problem = RAOCP(tree).with_markovian_dynamics(_dynamics())
    with pytest.raises(Exception):
        problem.with_all_leaf_costs(Quadratic(Nonleaf(), np.eye(3), np.eye(2)))
    with pytest.raises(Exception):
        problem.with_all_nonleaf_costs(Quadratic(Leaf(), np.eye(3)))
    with pytest.raises(Exception):
        problem.with_all_nonleaf_constraints(
            Rectangle(Leaf(), -np.ones(3), np.ones(3)))
    with pytest.raises(Exception):
        problem.with_all_leaf_constraints(
            Rectangle(Nonleaf(), -np.ones(5), np.ones(5)))


def test_markovian_assignment_indexes_by_w(tree):
    dyn = _dynamics()
    problem = RAOCP(tree).with_markovian_dynamics(dyn)
    for i in range(1, tree.num_nodes):
        w = tree.value_at_node(i)
        np.testing.assert_allclose(problem.state_dynamics_at_node(i),
                                   dyn[w].state_dynamics)


def test_risks_get_child_probabilities(tree):
    problem = (RAOCP(tree).with_markovian_dynamics(_dynamics())
               .with_all_risks(AVaR(0.95)))
    for i in range(tree.num_nonleaf_nodes):
        np.testing.assert_allclose(
            problem.risk_at_node(i).probs,
            tree.conditional_probabilities_of_children(i))


def test_default_constraints_inactive(tree):
    problem = RAOCP(tree)
    assert all(not problem.nonleaf_constraint_at_node(i).is_active
               for i in range(tree.num_nonleaf_nodes))
    assert all(not problem.leaf_constraint_at_node(i).is_active
               for i in range(tree.num_nonleaf_nodes, tree.num_nodes))


def test_node_kind_enum_identity():
    from raocp_tpu import NodeKind
    assert Nonleaf() is NodeKind.NONLEAF
    assert Leaf() is NodeKind.LEAF
    assert Node() is NodeKind.GENERIC


def test_avar_for_children_and_conic_form():
    from raocp_tpu.core.elements import avar_conic_form
    base = AVaR(0.5)
    realized = base.for_children([0.25, 0.75])
    assert base.probs is None                  # base stays unrealized
    np.testing.assert_allclose(realized.probs, [0.25, 0.75])
    form = avar_conic_form(0.5, [0.25, 0.75])
    np.testing.assert_allclose(form.matrix_e, realized.matrix_e)
    np.testing.assert_allclose(form.vector_b, realized.vector_b)


def test_constraint_bind_and_derived_matrices():
    rect = Rectangle(Nonleaf(), -np.ones(5), np.ones(5))
    assert rect.state_matrix is None           # unbound
    rect.bind(3, 2)
    assert rect.width == 5
    np.testing.assert_allclose(
        rect.state_matrix, np.vstack([np.eye(3), np.zeros((2, 3))]))
    np.testing.assert_allclose(
        rect.control_matrix, np.vstack([np.zeros((3, 2)), np.eye(2)]))
    np.testing.assert_allclose(rect.state_matrix_transposed,
                               rect.state_matrix.T)
    leaf_rect = Rectangle(Leaf(), -np.ones(3), np.ones(3))
    leaf_rect.bind(3)
    assert leaf_rect.width == 3
    assert leaf_rect.control_matrix is None
    with pytest.raises(Exception):
        leaf_rect.control_size = 2


def test_risk_realizations_are_shared_per_distinct_probs(tree):
    problem = (RAOCP(tree).with_markovian_dynamics(_dynamics())
               .with_all_risks(AVaR(0.95)))
    distinct = {id(problem.risk_at_node(i))
                for i in range(tree.num_nonleaf_nodes)}
    probs = {np.asarray(
        tree.conditional_probabilities_of_children(i)).tobytes()
        for i in range(tree.num_nonleaf_nodes)}
    assert len(distinct) == len(probs)


def test_stage_risks():
    """Per-stage risk assignment: node i carries the risk of its stage,
    realized with its own child probabilities; wrong list length and
    non-risk entries raise."""
    from raocp_tpu.core.elements import AVaR, TotalVariation
    from raocp_tpu.models import demo_problem

    problem, x0 = demo_problem()
    tree = problem.tree
    ns_nl = tree.num_stages - 1
    stage_risks = [AVaR(0.5) if k == 0 else TotalVariation(0.3)
                   for k in range(ns_nl)]
    problem.with_stage_risks(stage_risks)
    for i in range(tree.num_nonleaf_nodes):
        risk = problem.risk_at_node(i)
        if tree.stage_of(i) == 0:
            assert isinstance(risk, AVaR)
        else:
            assert isinstance(risk, TotalVariation)
        np.testing.assert_allclose(
            risk.probs, tree.conditional_probabilities_of_children(i))

    with pytest.raises(ValueError, match="one risk per nonleaf stage"):
        problem.with_stage_risks([AVaR(0.5)])
    with pytest.raises(ValueError, match="risk measures"):
        problem.with_stage_risks([object()] * ns_nl)

    # a stage-mixed problem solves end to end
    from raocp_tpu.solver import Solver
    solver = Solver(problem)
    res = solver.solve(x0, max_iters=8000, tol=1e-3)
    assert res.converged
    checks = solver.validate()
    assert checks["dynamics"] < 1e-8 and checks["kernel"] < 1e-8
