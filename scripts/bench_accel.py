#!/usr/bin/env python
"""Accelerated vs plain CP, time-to-1e-3 on the headline 9,841-node config
(BASELINE config 4: "SuperMann/L-BFGS accelerated iterations").

Runs plain CP (production stride), Anderson, and SuperMann/Broyden to the
BASELINE residual 1e-3 on the same problem + step size, best-of-3 wall
clock each. Prints one JSON line per run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_ITERS = 20000
TOL = 1e-3
REPEATS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_raocp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raocp_tpu.accel import run_cp_anderson, run_cp_supermann
    from raocp_tpu.models import random_network_problem
    from raocp_tpu.solver import Solver, _run_cp

    problem, x0 = random_network_problem(
        num_states=50, num_inputs=20, num_modes=3, num_stages=8,
        stopping_time=8)
    solver = Solver(problem, dtype=jnp.float32, offline="device")
    sp = solver.stacked
    alpha = jnp.asarray(0.999 / solver.operator_norm_sq(), sp.dtype)
    x0j = jnp.asarray(x0, sp.dtype)
    tol = jnp.asarray(TOL, sp.dtype)
    z0 = sp.zero_primal(xp=np)
    z0.x[0] = np.asarray(x0, dtype=z0.x.dtype)
    eta0 = sp.zero_dual(xp=np)

    def timed(name, fn, **extra):
        out = fn()                       # compile + converge once
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(REPEATS):
            tic = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - tic)
        iters = int(out[2])
        err = np.asarray(out[-2])       # _run_cp and accel: err before hist
        if len(out) == 6:               # accel loops report T evaluations
            extra["t_evals"] = int(out[3])
        rec = {
            "run": name,
            "iterations": iters,
            "converged": bool(err.max() <= TOL),
            "time_to_tol_s": round(best, 4),
            "iters_per_s": round(iters / best, 1),
            "xi_max": float(err.max()),
        }
        rec.update(extra)
        print(json.dumps(rec), flush=True)
        return rec

    timed("plain_cp_check25_unroll25",
          lambda: _run_cp(sp, z0, eta0, x0j, alpha, alpha, tol, MAX_ITERS,
                          check_every=25, unroll=25))
    # the solver's own zero-cost iteration cutter, for an honest "is accel
    # worth it" comparison: relaxation cuts iterations at no per-step cost
    for rho in (1.5, 1.8):
        timed(f"plain_cp_relax{rho}_check25_unroll25",
              lambda rho=rho: _run_cp(
                  sp, z0, eta0, x0j, alpha, alpha, tol, MAX_ITERS,
                  check_every=25, unroll=25, relax=rho), relax=rho)
    for mem in (5, 10):
        def and_run(mem=mem):
            return run_cp_anderson(sp, tuple(z0), tuple(eta0), x0j, alpha,
                                   tol, MAX_ITERS, memory=mem,
                                   check_every=25)

        timed(f"anderson_m{mem}_check25", and_run, memory=mem)
    for mem in (5, 10):
        def sm_run(mem=mem):
            return run_cp_supermann(sp, tuple(z0), tuple(eta0), x0j, alpha,
                                    tol, MAX_ITERS, memory=mem,
                                    check_every=25)

        timed(f"supermann_m{mem}_check25", sm_run, memory=mem)


if __name__ == "__main__":
    main()
