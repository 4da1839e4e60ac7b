"""Pallas TPU kernel: the dynamics-projection DP sweeps as ONE kernel.

The projection of (x, u) onto the dynamics subspace (reference
``cache.py:259-288``) is a backward stage recursion followed by a forward
rollout. As XLA ops this is ~8 small ops per stage, each with an HBM
round-trip for its intermediates; profiling shows the sweep dominated by
those round-trips, not FLOPs. This kernel keeps every intermediate (q, d,
x, u stage slices) in VMEM and runs both sweeps back-to-back in a single
``pallas_call``.

Eligibility (checked by :func:`sweep_eligible`): every nonleaf stage is
stage-constant — uniform branching with a uniform mode pattern and
stage-constant Riccati tables (``StackedProblem.k_s``; the condition the
stage-stacked mode blocks already require). All weights are then tiny
([c*n, n+m]-class blocks and [m, n]-class tables), so the whole working
set is VMEM-resident: x_in [N, n] + u_in [NL, m] in, x/u out, q/d as
values. Ragged trees use the XLA path (:func:`raocp_tpu.ops.prox.project_dynamics`).

The kernel is numerically identical to the XLA stage-stacked path (same
contractions in the same order, full-precision matmuls).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["sweep_eligible", "project_dynamics_pallas"]

# A/B measurements on a v5e chip (scripts/bench_pallas.py):
#   * 9841-node / 50-state headline: parity with the stage-stacked XLA
#     path (~86 us vs ~83 us per apply) — after the stage-constant-table
#     rewrite the sweep is bound by its sequential dependency chain, which
#     VMEM residency cannot shorten (and the 2.5x VMEM safety factor now
#     rules this size out anyway);
#   * 364-node / 96-state wide-shallow tree: **1.27x faster** (105.1 ->
#     82.8 us) — big per-stage matmuls, few stages: the regime where the
#     XLA path's per-op HBM round-trips dominate and VMEM residency pays.
# The kernel stays OPT-IN (RAOCP_TPU_PALLAS=1): the winning regime —
# small trees with large state dims, e.g. high-dimensional MPC with short
# horizons — is not the headline scale, and Mosaic rejects sub-tile state
# dims (n < 32: "only constant accumulators supported"), which
# sweep_eligible guards against.


def sweep_eligible(sp) -> bool:
    """True when the fused sweep kernel supports this problem and we are
    compiling for a real TPU (the XLA path remains the reference
    implementation everywhere else, including the CPU test backend)."""
    # read per call (late binding): flipping RAOCP_TPU_PALLAS after import
    # must take effect, matching how RAOCP_TPU_MATMUL_PRECISION behaves in
    # core/stacked.py
    if os.environ.get("RAOCP_TPU_PALLAS", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if sp.dtype != jnp.float32:
        return False
    if any(w is None for w in sp.ab_bwd) or any(k is None for k in sp.k_s):
        return False
    # Mosaic rejects the sweep's loop-carried accumulator at sub-tile state
    # dims ("only constant accumulators supported", measured at n=8 on
    # v5e); n=50/96 compile fine, so gate on a full sublane tile
    if sp.n < 32:
        return False
    # Working set must fit the 16 MB scoped-VMEM stack: x_in/x_out (np*n
    # each), the q stages (np*n total, all alive through the backward
    # sweep), u_in/u_out/d (nl*m each), and the stage [x; u] / children
    # temporaries (~2 * np * (n+m) with Mosaic double buffering). Measured
    # on the 9841-node 50-state problem the compiler's stack demand is
    # ~2.3x the naive sum, so apply a 2.5x safety factor — oversized
    # problems fall back to the XLA path instead of failing to compile.
    naive = 4 * (3 * sp.np_pad * sp.n + 3 * sp.nl_pad * sp.m
                 + sp.np_pad * (sp.n + sp.m))
    return int(2.5 * naive) < 16 * 2 ** 20


def _sweep_kernel(sp, x_in_ref, u_in_ref, x0_ref, ab_bwd_refs, ab_fwd_refs,
                  k_refs, rinv_refs, apb_refs, x_out_ref, u_out_ref):
    ss = sp.stage_start
    ns = sp.num_stages
    n, m = sp.n, sp.m
    N, NL = sp.num_nodes, sp.num_nonleaf
    hp = jax.lax.Precision.HIGHEST

    # ---- backward sweep: q over stages, d per nonleaf stage -------------
    q_stage = [None] * ns
    q_stage[ns - 1] = -x_in_ref[ss[ns - 1]:N]
    d_stage = [None] * (ns - 1)
    for k in range(ns - 2, -1, -1):
        a, b = ss[k], ss[k + 1]
        c = sp.stage_child[k]
        qc3 = q_stage[k + 1].reshape(b - a, c, n)   # free major-dim split
        wb = ab_bwd_refs[k][:]                      # [c, n, F]
        # Mosaic matmuls contract one dim: one [W, n] @ [n, F] per sibling
        abtq = jnp.dot(qc3[:, 0, :], wb[0], precision=hp)
        for r in range(1, c):
            abtq = abtq + jnp.dot(qc3[:, r, :], wb[r], precision=hp)
        sum_atq, sum_btq = abtq[:, :n], abtq[:, n:]
        u_k = u_in_ref[a:b]
        d_k = jnp.dot(u_k - sum_btq, rinv_refs[k][:].T, precision=hp)
        q_stage[k] = (-x_in_ref[a:b]
                      + jnp.dot(d_k - u_k + sum_btq, k_refs[k][:],
                                precision=hp)
                      + jnp.dot(d_k, apb_refs[k][:].T, precision=hp)
                      + sum_atq)
        d_stage[k] = d_k

    # ---- forward rollout -------------------------------------------------
    x_k = x0_ref[:]                          # [1, n]
    for k in range(ns - 1):
        a, b = ss[k], ss[k + 1]
        a2, b2 = ss[k + 1], ss[k + 2]
        c = sp.stage_child[k]
        u_k = jnp.dot(x_k, k_refs[k][:].T, precision=hp) + d_stage[k]
        u_out_ref[a:b] = u_k
        xu_k = jnp.concatenate([x_k, u_k], axis=1)
        wf = ab_fwd_refs[k][:]                      # [F, c, n]
        x3 = jnp.stack([jnp.dot(xu_k, wf[:, r, :], precision=hp)
                        for r in range(c)], axis=1)  # [W, c, n]
        x_out_ref[a:b] = x_k
        x_k = x3.reshape(b2 - a2, n)                 # free major-dim merge
    x_out_ref[ss[ns - 1]:N] = x_k
    if sp.np_pad > N:
        x_out_ref[N:] = jnp.zeros((sp.np_pad - N, n), sp.dtype)
    if sp.nl_pad > NL:
        u_out_ref[NL:] = jnp.zeros((sp.nl_pad - NL, m), sp.dtype)


def project_dynamics_pallas(sp, x_in, u_in, x0, interpret: bool = False):
    """Fused-sweep projection; same contract as
    :func:`raocp_tpu.ops.prox.project_dynamics` for eligible problems."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ns_nl = sp.num_stages - 1
    kernel = partial(_sweep_kernel, sp)

    def body(x_in, u_in, x0, *weights):
        specs = [pl.BlockSpec(memory_space=pltpu.VMEM)
                 for _ in range(3 + len(weights))]
        return pl.pallas_call(
            lambda *refs: kernel(
                refs[0], refs[1], refs[2],
                refs[3:3 + ns_nl], refs[3 + ns_nl:3 + 2 * ns_nl],
                refs[3 + 2 * ns_nl:3 + 3 * ns_nl],
                refs[3 + 3 * ns_nl:3 + 4 * ns_nl],
                refs[3 + 4 * ns_nl:3 + 5 * ns_nl],
                refs[-2], refs[-1]),
            out_shape=(jax.ShapeDtypeStruct((sp.np_pad, sp.n), sp.dtype),
                       jax.ShapeDtypeStruct((sp.nl_pad, sp.m), sp.dtype)),
            in_specs=specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(x_in, u_in, x0, *weights)

    weights = (list(sp.ab_bwd) + list(sp.ab_fwd) + list(sp.k_s)
               + list(sp.rinv_s) + list(sp.sumapb_s))
    return body(x_in, u_in, x0.reshape(1, sp.n), *weights)
