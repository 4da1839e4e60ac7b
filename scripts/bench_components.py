#!/usr/bin/env python
"""Per-component device timing of the CP iteration on the benchmark problem.

Times each piece of one Chambolle-Pock step (L, L', prox_f sweeps, dual
projections, residual norms) by running it inside a jitted ``fori_loop``
with a data dependency between iterations, so XLA cannot elide or overlap
across trips. Used to decide where optimisation effort goes; not part of
the headline bench.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=200):
    """Time fn inside a fori_loop; a scalar from the output is folded back
    into the carry so trips are serialised without changing shapes."""
    @jax.jit
    def loop(*args):
        def body(_, a):
            out = fn(*a)
            dep = sum(jnp.sum(l.ravel()[:1])
                      for l in jax.tree_util.tree_leaves(out))
            dep = 1e-30 * dep    # not 0.0: XLA would fold it and DCE fn
            return jax.tree_util.tree_map(lambda x: x + dep, a)
        return jax.lax.fori_loop(0, iters, body, args)

    out = loop(*args)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    out = loop(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - tic) / iters * 1e6  # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, default=8)
    ap.add_argument("--states", type=int, default=50)
    ap.add_argument("--inputs", type=int, default=20)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_raocp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raocp_tpu.models import random_network_problem
    from raocp_tpu.ops.operator import ell, ell_t
    from raocp_tpu.ops.prox import (g_conj_projections, project_dynamics,
                                    project_kernel, prox_f)
    from raocp_tpu.solver import Solver, cp_iteration

    problem, x0 = random_network_problem(
        num_states=args.states, num_inputs=args.inputs, num_modes=3,
        num_stages=args.stages, stopping_time=args.stages)
    solver = Solver(problem, dtype=jnp.float32, offline="device")
    sp = solver.stacked

    x0j = jnp.asarray(x0, sp.dtype)
    key = jax.random.PRNGKey(0)
    z = sp.zero_primal()
    z = z._replace(
        x=jax.random.normal(key, z.x.shape, sp.dtype),
        u=jax.random.normal(key, z.u.shape, sp.dtype))
    eta = ell(sp, z)
    alpha = jnp.asarray(0.01, sp.dtype)

    it = args.iters
    t_noop = _time(lambda v: (v,), z.x, iters=it)
    t_ell = _time(lambda z: (ell(sp, z),), z, iters=it)
    t_ellt = _time(lambda e: (ell_t(sp, e),), eta, iters=it)
    t_dyn = _time(lambda x, u: project_dynamics(sp, x, u, x0j), z.x, z.u,
                  iters=it)
    t_ker = _time(lambda y, t, s: project_kernel(sp, y, t, s),
                  z.y, z.tau, z.s, iters=it)
    t_pf = _time(lambda zz: (prox_f(sp, zz, alpha, x0j),), z, iters=it)
    t_gp = _time(lambda e: (g_conj_projections(sp, e),), eta, iters=it)
    t_norm = _time(lambda v: (jnp.max(jnp.abs(v)) * v,), z.x, iters=it)

    def full(z, eta, Lz, Lt):
        return cp_iteration(sp, z, eta, Lz, Lt, alpha, alpha, x0j)[:4]

    t_full = _time(full, z, eta, ell(sp, z), ell_t(sp, eta), iters=it)

    def step_only(z, eta, Lz, Lt):
        from raocp_tpu.solver import _cp_step
        return _cp_step(sp, z, eta, Lz, Lt, alpha, alpha, x0j)

    t_step = _time(step_only, z, eta, ell(sp, z), ell_t(sp, eta), iters=it)

    print(f"nodes={sp.num_nodes} n={sp.n} m={sp.m}")
    print(f"noop (loop+dep)     {t_noop:8.1f} us")
    print(f"L apply             {t_ell:8.1f} us")
    print(f"L' apply            {t_ellt:8.1f} us")
    print(f"dynamics projection {t_dyn:8.1f} us")
    print(f"kernel projection   {t_ker:8.1f} us")
    print(f"prox_f total        {t_pf:8.1f} us")
    print(f"g* projections      {t_gp:8.1f} us")
    print(f"max-norm            {t_norm:8.1f} us")
    print(f"CP step (no resid)  {t_step:8.1f} us")
    print(f"FULL CP iteration   {t_full:8.1f} us")
    print(f"  (2L' + L + prox_f + g* = "
          f"{2 * t_ellt + t_ell + t_pf + t_gp:8.1f} us)")


if __name__ == "__main__":
    main()
