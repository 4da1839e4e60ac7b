#!/usr/bin/env python
"""Scaling-efficiency harness: CP iterations/s at 1, 2, 4, ... devices.

BASELINE.json's scaling target is ">=70% efficiency at 2 hosts". This
script measures iterations/s of the full sharded CP step over meshes of
growing size and prints one JSON line per mesh with the parallel
efficiency vs the 1-device run.

On real multi-chip hardware run it directly (optionally after
``raocp_tpu.parallel.initialize_distributed()`` on a pod). Without one it
falls back to virtual CPU devices (``--virtual N``), which validates the
SPMD program end-to-end; virtual-device timings share the same host cores,
so efficiency numbers are only meaningful on real hardware.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--num-stages", type=int, default=8)
    ap.add_argument("--num-states", type=int, default=50)
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_raocp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raocp_tpu.core.stacked import build_stacked
    from raocp_tpu.models import random_network_problem
    from raocp_tpu.parallel import make_mesh, shard_problem, shard_variables
    from raocp_tpu.solver import _run_cp

    n_dev = len(jax.devices())
    sizes = [1]
    while sizes[-1] * 2 <= n_dev:
        sizes.append(sizes[-1] * 2)

    problem, x0 = random_network_problem(
        num_states=args.num_states, num_inputs=args.num_states // 2,
        num_modes=3, num_stages=args.num_stages,
        stopping_time=args.num_stages)

    base_ips = None
    for nd in sizes:
        sp = build_stacked(problem, dtype=jnp.float32, pad_multiple=nd,
                           offline="device")
        mesh = make_mesh(num_devices=nd)
        sp = shard_problem(sp, mesh)
        z0 = shard_variables(sp.zero_primal(), mesh)
        z0 = z0._replace(x=z0.x.at[0].set(jnp.asarray(x0, sp.dtype)))
        eta0 = shard_variables(sp.zero_dual(), mesh)
        x0j = jnp.asarray(x0, sp.dtype)
        alpha = jnp.asarray(0.01, sp.dtype)
        tol0 = jnp.asarray(0.0, sp.dtype)

        out = _run_cp(sp, z0, eta0, x0j, alpha, alpha, tol0, args.iters)
        jax.block_until_ready(out)
        tic = time.perf_counter()
        out = _run_cp(sp, z0, eta0, x0j, alpha, alpha, tol0, args.iters)
        jax.block_until_ready(out)
        dt_s = time.perf_counter() - tic
        ips = int(out[2]) / dt_s
        if base_ips is None:
            base_ips = ips
        print(json.dumps({
            "devices": nd,
            "num_nodes": problem.tree.num_nodes,
            "iters_per_s": round(ips, 2),
            "speedup": round(ips / base_ips, 3),
            "efficiency": round(ips / base_ips / nd, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
