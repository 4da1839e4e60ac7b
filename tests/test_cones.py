"""Cone projection tests.

The projection inequality <v - Pv, s - Pv> <= 0 for all s in the cone
characterises the Euclidean projection — checked against sampled cone points
for both the host-side classes (parity with reference tests/test_cones.py)
and the batched device kernels in raocp_tpu.ops.cones.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raocp_tpu.core.constraints.cones import (Cartesian, NonnegativeOrthant,
                                              Real, SecondOrderCone, Zero)
from raocp_tpu.ops import cones as jcones

RNG = np.random.default_rng(42)
NUM_SAMPLES = 100
DIM = 10


def _sample_soc_points(num, dim):
    x = RNG.standard_normal((num, dim - 1))
    t = np.linalg.norm(x, axis=1) * (1 + RNG.random(num))
    return np.concatenate([x, t[:, None]], axis=1)


def _check_projection_inequality(v, proj, samples):
    # <v - Pv, s - Pv> <= 0 for all cone points s
    for s in samples:
        assert np.dot(v - proj, s - proj) <= 1e-9


def test_real_project():
    v = RNG.standard_normal(DIM)
    cone = Real()
    assert (cone.project(v) == v).all()
    assert (cone.project_onto_dual(v) == 0).all()


def test_zero_project():
    v = RNG.standard_normal(DIM)
    cone = Zero()
    assert (cone.project(v) == 0).all()
    assert (cone.project_onto_dual(v) == v).all()


def test_nonneg_project_inequality():
    v = RNG.standard_normal(DIM)
    proj = NonnegativeOrthant().project(v)
    samples = np.abs(RNG.standard_normal((NUM_SAMPLES, DIM)))
    _check_projection_inequality(v, proj, samples)


def test_soc_project_inequality():
    cone = SecondOrderCone()
    samples = _sample_soc_points(NUM_SAMPLES, DIM)
    for _ in range(20):
        v = 3 * RNG.standard_normal(DIM)
        proj = cone.project(v).reshape(-1)
        _check_projection_inequality(v, proj, samples)
        # projection is idempotent and lands in the cone
        assert np.linalg.norm(proj[:-1]) <= proj[-1] + 1e-9


def test_soc_rejects_small_vectors():
    with pytest.raises(Exception):
        SecondOrderCone().project(np.ones(2))


def test_cartesian_project():
    cone = Cartesian([NonnegativeOrthant(dimension=4), Zero(dimension=2)])
    v = RNG.standard_normal((6, 1))
    proj = cone.project([v])
    assert (proj[:4] == np.maximum(v[:4], 0)).all()
    assert (proj[4:] == 0).all()
    dual = cone.project_onto_dual([v])
    assert (dual[:4] == np.maximum(v[:4], 0)).all()
    assert (dual[4:] == v[4:]).all()


# -- batched device kernels ------------------------------------------------


def test_batched_soc_matches_host():
    host = SecondOrderCone()
    v = 3 * RNG.standard_normal((200, DIM))
    batched = np.asarray(jcones.soc_project(jnp.asarray(v)))
    for i in range(v.shape[0]):
        expected = host.project(v[i]).reshape(-1)
        np.testing.assert_allclose(batched[i], expected, atol=1e-12)


def test_batched_soc_edge_cases():
    # origin, on-boundary, in-polar, deep-in-cone
    v = np.array([
        [0.0, 0.0, 0.0],
        [1.0, 0.0, 1.0],
        [1.0, 0.0, -2.0],
        [0.1, 0.1, 5.0],
    ])
    out = np.asarray(jcones.soc_project(jnp.asarray(v)))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], v[1])
    np.testing.assert_allclose(out[2], 0.0)
    np.testing.assert_allclose(out[3], v[3])


def test_batched_nonneg_and_box():
    v = RNG.standard_normal((50, 7))
    np.testing.assert_allclose(np.asarray(jcones.nonneg_project(v)),
                               np.maximum(v, 0))
    lo, hi = -0.5 * np.ones(7), 0.25 * np.ones(7)
    np.testing.assert_allclose(np.asarray(jcones.box_project(v, lo, hi)),
                               np.clip(v, lo, hi))
    # +-inf bounds = unbounded
    lo_inf = np.full(7, -np.inf)
    np.testing.assert_allclose(
        np.asarray(jcones.box_project(v, lo_inf, np.full(7, np.inf))), v)


def test_risk_dual_project_padded():
    d_max = 3
    Y = 2 * d_max + 1
    rows = 20
    # per-node masks: node k has c=2 children -> AVaR rows [0, 2c], Zero
    # row at slot 2c, padded slots beyond
    c = 2
    free = np.zeros((rows, Y), dtype=bool)
    free[:, 2 * c] = True
    zero = np.zeros((rows, Y), dtype=bool)
    v = RNG.standard_normal((rows, Y))
    v[:, 2 * c + 1:] = 0.0                 # pad invariant
    out = np.asarray(jcones.risk_dual_project(jnp.asarray(v), free, zero))
    np.testing.assert_allclose(out[:, :2 * c], np.maximum(v[:, :2 * c], 0))
    np.testing.assert_allclose(out[:, 2 * c], v[:, 2 * c])
    np.testing.assert_allclose(out[:, 2 * c + 1:], 0.0)


def test_risk_dual_project_row_kinds():
    """Mixed NnOC / Zero / Real rows: dual-cone projection is max(0, .) /
    identity / 0 per row; and it satisfies the projection variational
    inequality against sampled dual-cone points."""
    rows, Y = 30, 9
    free = np.zeros((rows, Y), dtype=bool)   # Zero-cone rows (dual = R)
    zero = np.zeros((rows, Y), dtype=bool)   # Real-cone rows (dual = {0})
    free[:, 3] = True
    free[:, 7] = True
    zero[:, 5] = True
    v = RNG.standard_normal((rows, Y))
    out = np.asarray(jcones.risk_dual_project(
        jnp.asarray(v), jnp.asarray(free), jnp.asarray(zero)))
    for col in range(Y):
        if free[0, col]:
            np.testing.assert_allclose(out[:, col], v[:, col])
        elif zero[0, col]:
            np.testing.assert_allclose(out[:, col], 0.0)
        else:
            np.testing.assert_allclose(out[:, col],
                                       np.maximum(v[:, col], 0))
    # variational inequality <v - Pv, s - Pv> <= 0 for s in the dual cone
    for _ in range(50):
        s = RNG.standard_normal((rows, Y))
        s = np.where(free[0], s, np.where(zero[0], 0.0, np.maximum(s, 0)))
        lhs = np.sum((v - out) * (s - out), axis=1)
        assert (lhs <= 1e-9).all()


def test_ball_project_properties():
    """Projection onto ||v - c|| <= r: inside-identity, surface mapping, and
    the variational inequality <v - Pv, s - Pv> <= 0 for feasible s."""
    from raocp_tpu.ops.cones import ball_project

    r = 2.0
    c = np.array([1.0, -1.0, 0.5])
    v = RNG.standard_normal((100, 3)) * 3.0 + c
    out = np.asarray(ball_project(jnp.asarray(v), jnp.asarray(c), r))
    norms = np.linalg.norm(v - c, axis=1)
    # inside stays put, outside lands on the surface
    inside = norms <= r
    np.testing.assert_allclose(out[inside], v[inside])
    np.testing.assert_allclose(np.linalg.norm(out[~inside] - c, axis=1), r,
                               atol=1e-12)
    # variational inequality against 100 sampled feasible points
    for _ in range(100):
        s = c + RNG.standard_normal(3) * 0.5
        if np.linalg.norm(s - c) > r:
            s = c + (s - c) * r / np.linalg.norm(s - c)
        gap = np.einsum("ij,ij->i", v - out, s[None, :] - out)
        assert np.all(gap <= 1e-10)


def test_ball_project_inf_radius_identity_and_zero_rows():
    from raocp_tpu.ops.cones import ball_project

    v = RNG.standard_normal((10, 4))
    v[3] = 0.0
    out = np.asarray(ball_project(jnp.asarray(v), jnp.zeros(4), jnp.inf))
    np.testing.assert_allclose(out, v)
    # zero rows stay exactly zero even with finite radius (pad invariant)
    out2 = np.asarray(ball_project(jnp.asarray(v), jnp.zeros(4), 0.5))
    np.testing.assert_allclose(out2[3], 0.0)


def test_constraint_project_dispatch():
    """Rows with finite radius use the ball, others the box."""
    from raocp_tpu.ops.cones import constraint_project

    v = RNG.standard_normal((6, 3)) * 5
    lo, hi = -np.ones((6, 3)), np.ones((6, 3))
    c = np.zeros((6, 3))
    r = np.array([np.inf, np.inf, 1.0, 1.0, np.inf, 2.0])
    out = np.asarray(constraint_project(
        jnp.asarray(v), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(c), jnp.asarray(r)))
    for i in range(6):
        if np.isfinite(r[i]):
            nv = np.linalg.norm(v[i])
            exp = v[i] if nv <= r[i] else v[i] * r[i] / nv
        else:
            exp = np.clip(v[i], lo[i], hi[i])
        np.testing.assert_allclose(out[i], exp, atol=1e-12)


def test_ball_class_host_projection():
    from raocp_tpu.core.constraints.sets import Ball
    from raocp_tpu.core.elements import Nonleaf

    ball = Ball(Nonleaf(), radius=1.5, center=[1.0, 0.0])
    inside = np.array([1.2, 0.3])
    np.testing.assert_allclose(ball.project(inside), inside)
    far = np.array([5.0, 0.0])
    np.testing.assert_allclose(ball.project(far), [2.5, 0.0])
    with pytest.raises(Exception):
        Ball(Nonleaf(), radius=0.0)
