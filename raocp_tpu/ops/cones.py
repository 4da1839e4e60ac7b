"""Batched conic projections (pure jnp functions, vmapped over tree nodes).

These are the device-side counterparts of the single-vector cone classes in
:mod:`raocp_tpu.core.constraints.cones` (reference
``raocp/core/constraints/cones.py``): elementwise max/clip for the orthant
and box, a select-based three-case formula for the second-order cone, and a
masked orthant+identity map for the (padded) risk ambiguity dual cone.
All are safe under padding: zero inputs map to zero outputs.
"""

import jax.numpy as jnp

__all__ = ["nonneg_project", "box_project", "ball_project",
           "constraint_project", "soc_project", "soc_project_parts",
           "risk_dual_project"]


def nonneg_project(v):
    """Projection onto R^n_+ (self-dual)."""
    return jnp.maximum(v, 0)


def ball_project(v, c, r):
    """Projection onto the Euclidean ball ||v - c|| <= r over the last axis.

    ``r = +inf`` rows are the identity (inactive), and the zero-vector /
    zero-padding rows stay zero — both via selects, no NaNs."""
    dv = v - c
    norm = jnp.sqrt(jnp.sum(dv * dv, axis=-1))
    scale = jnp.where(norm > r, r / jnp.where(norm > 0, norm, 1.0), 1.0)
    return c + dv * scale[..., None]


def constraint_project(v, lo, hi, c, r):
    """Per-node constraint-set projection: rows with finite ``r`` are
    Euclidean balls (``Ball``), the rest boxes (``Rectangle``; +-inf bounds =
    unconstrained/identity). One fused batched select — no per-node
    control flow."""
    return jnp.where(jnp.isfinite(r)[..., None],
                     ball_project(v, c, r),
                     box_project(v, lo, hi))


def box_project(v, lo, hi):
    """Projection onto the box [lo, hi] (+-inf entries = unbounded)."""
    return jnp.clip(v, lo, hi)


def soc_project_parts(x, t):
    """Projection onto the second-order cone {(x, t): ||x|| <= t}.

    ``x``: [..., k] head, ``t``: [...] tail. Returns (proj_x, proj_t).
    Three-case formula (parity: reference ``cones.py:113-135``), expressed
    with selects so it batches on the VPU.
    """
    nx = jnp.sqrt(jnp.sum(x * x, axis=-1))
    in_cone = nx <= t
    in_polar = nx <= -t
    half = 0.5 * (nx + t)
    # guard the 0/0 at the origin (origin is in the cone, so branch unused)
    safe_nx = jnp.where(nx > 0, nx, 1)
    scale = jnp.where(in_cone, 1.0, half / safe_nx)
    scale = jnp.where(in_polar, 0.0, scale)
    proj_x = x * scale[..., None]
    proj_t = jnp.where(in_cone, t, jnp.where(in_polar, 0.0, half))
    return proj_x, proj_t


def soc_project(v):
    """SOC projection of stacked [..., k] vectors (last coordinate = t)."""
    proj_x, proj_t = soc_project_parts(v[..., :-1], v[..., -1])
    return jnp.concatenate([proj_x, proj_t[..., None]], axis=-1)


def risk_dual_project(v, free_rows, zero_rows, soc_rows=None, soc_tail=None):
    """Projection onto the dual of each node's risk ambiguity cone.

    The cone is any Cartesian product of NnOC / Zero / Real rows plus at
    most one SecondOrderCone block, described by per-node boolean row masks
    ([num_nonleaf, Y], natural row order): ``free_rows`` marks Zero-cone
    rows (dual = R, projection = identity), ``zero_rows`` marks Real-cone
    rows (dual = {0}, projection = 0); all other non-SOC rows are NnOC
    (self-dual, max(0, .)). ``soc_rows`` / ``soc_tail`` (both None when no
    node has an SOC block — e.g. every reference risk) mark the member /
    radial rows of the node's SOC block, projected jointly with the
    standard three-case formula (self-dual). Padded slots carry zeros in
    every mask and the input (max(0, 0) = 0 keeps them zero). For AVaR the
    masks encode NnOC(2c) x Zero(1) (reference ``risks.py:28-35``); for
    the L2Ball risk, NnOC(c) x Zero(1) x SOC(c+1).
    """
    rowwise = jnp.where(free_rows, v,
                        jnp.where(zero_rows, 0.0, jnp.maximum(v, 0)))
    if soc_rows is None:
        return rowwise
    x = v * soc_rows                                        # member rows
    nx = jnp.sqrt(jnp.sum(x * x, axis=1))                   # [NL]
    t = jnp.sum(v * soc_tail, axis=1)                       # [NL] radial
    # three-case SOC projection per node: inside -> identity, polar ->
    # zero, else scale members to (nx + t)/2 and set the radial row to it
    inside = nx <= t
    polar = nx <= -t
    t_half = 0.5 * (nx + t)
    x_coef = jnp.where(inside, 1.0,
                       jnp.where(polar, 0.0,
                                 t_half / jnp.maximum(nx,
                                                      jnp.finfo(v.dtype).tiny)))
    t_new = jnp.where(inside, t, jnp.where(polar, 0.0, t_half))
    return jnp.where(soc_rows, x_coef[:, None] * v,
                     jnp.where(soc_tail, t_new[:, None], rowwise))
