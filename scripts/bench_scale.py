#!/usr/bin/env python
"""Scale benchmark: CP iterations/s on a ~10^5-node scenario-tree RAOCP
(BASELINE target: >=5x iterations/s vs the CPU reference at 10^5 nodes).

Config: 50-state / 20-input network, 3-mode chain, 10 stages fully branched
(88573 nodes), AVaR(0.95), box constraints, float32, device-offline build.
Prints one JSON line like bench.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ITERS = 1000   # long enough that per-call dispatch is noise


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--unroll", type=int, default=5,
                    help="CP steps per while-loop trip (must divide 25); "
                         "moderate unroll amortises trip bookkeeping "
                         "without the compile-time blowup of unroll=25 at "
                         "this program size")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_raocp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raocp_tpu.models import random_network_problem
    from raocp_tpu.solver import Solver, _power_iteration, _run_cp

    t0 = time.perf_counter()
    problem, x0 = random_network_problem(
        num_states=50, num_inputs=20, num_modes=3, num_stages=10,
        stopping_time=10)
    solver = Solver(problem, dtype=jnp.float32, offline="device")
    sp = solver.stacked
    jax.block_until_ready(sp.Pi)
    build_s = time.perf_counter() - t0

    lam, _ = _power_iteration(sp)
    alpha = jnp.asarray(0.999 / float(lam), sp.dtype)
    x0j = jnp.asarray(x0, sp.dtype)
    tol0 = jnp.asarray(0.0, sp.dtype)
    z0 = sp.zero_primal(xp=np)
    z0.x[0] = np.asarray(x0, dtype=z0.x.dtype)
    eta0 = sp.zero_dual(xp=np)
    # device-resident inputs: a numpy iterate re-transfers ~130 MB through
    # the tunnelled link per call (~8 ms/iteration at 100 iterations —
    # measured to HALVE the apparent 1e5-node throughput)
    z0 = jax.tree_util.tree_map(jnp.asarray, z0)
    eta0 = jax.tree_util.tree_map(jnp.asarray, eta0)

    # unroll=25 at ~1e5 nodes multiplies an already-large while-body HLO
    # and compile time explodes; moderate unroll (default 5) amortises the
    # trip bookkeeping at 5x the body size — dead check slots are skipped
    # statically (solver.py: only a trip's last step can hit a check
    # boundary when unroll divides check_every)
    out = _run_cp(sp, z0, eta0, x0j, alpha, alpha, tol0, BENCH_ITERS,
                  check_every=25, unroll=args.unroll)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        tic = time.perf_counter()
        out = _run_cp(sp, z0, eta0, x0j, alpha, alpha, tol0, BENCH_ITERS,
                      check_every=25, unroll=args.unroll)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - tic)
    toc, tic = best, 0.0

    iters = int(out[2])
    ips = iters / (toc - tic)
    print(json.dumps({
        "metric": "cp_iterations_per_s_88573node_50state_tree",
        "value": round(ips, 3),
        "unit": "iter/s",
        "build_seconds": round(build_s, 1),
        "unroll": args.unroll,
        "num_nodes": sp.num_nodes,
    }))


if __name__ == "__main__":
    main()
