#!/usr/bin/env python
"""A/B the fused Pallas dynamics-projection sweep vs the XLA stage path.

The kernel (ops/pallas_sweep.py) keeps both DP sweeps VMEM-resident in one
``pallas_call``. Measured at parity on the 9,841-node/50-state headline
problem; this script scans the regimes where the balance could flip —
deep/narrow trees (more stages => more per-op launch overhead on the XLA
path) and small state dims (less data per op) — timing project_dynamics
with the kernel ON vs OFF on the same StackedProblem. Prints one JSON line
per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _time(fn, *args, iters=300):
    @jax.jit
    def loop(*args):
        def body(_, a):
            out = fn(*a)
            dep = sum(jnp.sum(l.ravel()[:1])
                      for l in jax.tree_util.tree_leaves(out))
            return jax.tree_util.tree_map(lambda x: x + 1e-30 * dep, a)
        return jax.lax.fori_loop(0, iters, body, args)

    out = loop(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        tic = time.perf_counter()
        jax.block_until_ready(loop(*args))
        best = min(best, time.perf_counter() - tic)
    return best / iters * 1e6  # us


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_raocp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raocp_tpu.models import random_network_problem
    from raocp_tpu.ops.pallas_sweep import sweep_eligible
    from raocp_tpu.ops.prox import project_dynamics
    from raocp_tpu.solver import Solver

    # (label, states, inputs, modes, stages) — deep/narrow to wide/shallow
    configs = [
        ("deep_binary_14st_8state", 8, 3, 2, 14),
        ("deep_tern_10st_16state", 16, 6, 3, 10),
        ("headline_8st_50state", 50, 20, 3, 8),
        ("wide_5st_96state", 96, 32, 3, 5),
    ]
    # scope the RAOCP_TPU_PALLAS override: restore the caller's value on
    # exit so importing/chaining this bench never leaks a changed env
    saved = os.environ.get("RAOCP_TPU_PALLAS")
    try:
        for label, n, m, modes, stages in configs:
            problem, x0 = random_network_problem(
                num_states=n, num_inputs=m, num_modes=modes,
                num_stages=stages, stopping_time=stages)
            solver = Solver(problem, dtype=jnp.float32, offline="device")
            sp = solver.stacked
            x0j = jnp.asarray(x0, sp.dtype)
            key = jax.random.PRNGKey(0)
            x_in = jax.random.normal(key, (sp.np_pad, sp.n), sp.dtype)
            u_in = jax.random.normal(key, (sp.nl_pad, sp.m), sp.dtype)

            os.environ["RAOCP_TPU_PALLAS"] = "0"
            t_xla = _time(lambda x, u: project_dynamics(sp, x, u, x0j),
                          x_in, u_in)
            os.environ["RAOCP_TPU_PALLAS"] = "1"
            eligible = sweep_eligible(sp)
            t_pl = fail = None
            if eligible:
                try:
                    t_pl = _time(
                        lambda x, u: project_dynamics(sp, x, u, x0j),
                        x_in, u_in)
                except Exception as e:  # Mosaic compile failures etc.
                    fail = str(e).splitlines()[0][:120]
            print(json.dumps({
                "config": label, "num_nodes": sp.num_nodes,
                "xla_us": round(t_xla, 1),
                "pallas_us": round(t_pl, 1) if t_pl is not None else None,
                "eligible": eligible, "error": fail,
                "speedup": round(t_xla / t_pl, 2) if t_pl else None,
            }), flush=True)
    finally:
        if saved is None:
            os.environ.pop("RAOCP_TPU_PALLAS", None)
        else:
            os.environ["RAOCP_TPU_PALLAS"] = saved


if __name__ == "__main__":
    main()
