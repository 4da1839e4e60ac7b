"""Worker process for the 2-process jax.distributed test.

Launched by tests/test_distributed.py as ``python distributed_worker.py
<port> <process_id>``. Each of the two processes owns 2 virtual CPU
devices; ``initialize_distributed`` joins them into one 4-device global
runtime (cross-process collectives ride Gloo on CPU — the localhost
analogue of ICI/DCN on a pod). The worker then shards the demo problem
over the GLOBAL mesh and runs the full CP loop for a fixed number of
iterations, printing the residuals + history checksum as one JSON line for
the parent to compare against a single-process reference.
"""

import json
import os
import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    # fresh env per process: 2 local virtual CPU devices each
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from raocp_tpu.parallel import (initialize_distributed, make_mesh,
                                    shard_problem, shard_variables)

    n = initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert n == 4, f"expected 4 global devices, got {n}"
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp
    import numpy as np

    from raocp_tpu.core.stacked import build_stacked
    from raocp_tpu.models import demo_problem
    from raocp_tpu.ops.operator import ell, ell_t
    from raocp_tpu.core.variables import tree_inf_norm
    from raocp_tpu.solver import _run_cp

    problem, x0 = demo_problem()
    sp = build_stacked(problem, pad_multiple=4)
    mesh = make_mesh()                       # all 4 global devices
    sp = shard_problem(sp, mesh)

    # a sharded operator apply on its own (the minimal collective check)
    z1 = sp.zero_primal(xp=np)
    z1.x[:] = np.linspace(-1.0, 1.0, z1.x.size).reshape(z1.x.shape)
    z1_sh = shard_variables(z1, mesh)
    # sp must be an ARGUMENT (not a closure constant): jit cannot embed
    # values spanning non-addressable devices
    op_norm = float(jax.jit(
        lambda s, z: tree_inf_norm(ell(s, z)))(sp, z1_sh))

    # the full CP loop under the global mesh
    z0 = sp.zero_primal(xp=np)
    z0.x[0] = np.asarray(x0, dtype=z0.x.dtype)
    eta0 = sp.zero_dual(xp=np)
    alpha = jnp.asarray(0.2, sp.dtype)
    out = _run_cp(sp, tuple(shard_variables(z0, mesh)),
                  tuple(shard_variables(eta0, mesh)),
                  jnp.asarray(x0, sp.dtype), alpha, alpha,
                  jnp.asarray(0.0, sp.dtype), max_iters=30)
    jax.block_until_ready(out)
    _, _, iters, err, hist = out
    hist = np.asarray(hist)
    # L'(eta) exercises the adjoint's cross-shard reductions too
    eta1 = sp.zero_dual(xp=np)
    eta1.e3[:] = 0.5
    adj_norm = float(jax.jit(
        lambda s, e: tree_inf_norm(ell_t(s, e)))(
            sp, shard_variables(eta1, mesh)))

    # the SUBTREE partition under the same 2-process global mesh: the full
    # production loop with frontier psums riding the Gloo backend
    from raocp_tpu.parallel.subtree import build_subtree_problem

    stp = build_subtree_problem(problem, mesh)
    zs = stp.zero_primal_global_layout()
    zs.x[::stp.l_np] = np.asarray(x0, zs.x.dtype)
    es = stp.zero_dual_global_layout()
    out_s = stp.run_cp(zs, es, jnp.asarray(np.asarray(x0), stp.sp.dtype),
                       alpha, alpha, jnp.asarray(0.0, stp.sp.dtype),
                       max_iters=30)
    jax.block_until_ready(out_s)
    err_s = np.asarray(out_s[3])
    hist_s = np.asarray(out_s[4])

    print(json.dumps({
        "pid": pid,
        "iters": int(iters),
        "err": [float(v) for v in np.asarray(err)],
        "hist_sum": float(np.nansum(hist)),
        "op_norm": op_norm,
        "adj_norm": adj_norm,
        "subtree_err": [float(v) for v in err_s],
        "subtree_hist_sum": float(np.nansum(hist_s)),
    }), flush=True)


if __name__ == "__main__":
    main()
