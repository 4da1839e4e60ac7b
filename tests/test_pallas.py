"""Parity tests for the Pallas fused-sweep kernel (interpreter mode).

The kernel is TPU-only when compiled; the Pallas interpreter executes the
same kernel program on the CPU test backend, cross-checked against the XLA
stage-stacked path (itself oracle-tested against the dense QP solution in
tests/test_prox.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from raocp_tpu.core.stacked import build_stacked
from raocp_tpu.models import random_network_problem
from raocp_tpu.ops.pallas_sweep import project_dynamics_pallas
from raocp_tpu.ops.prox import project_dynamics


def test_fused_sweep_matches_xla_path():
    problem, x0 = random_network_problem(
        num_states=6, num_inputs=3, num_modes=3, num_stages=4,
        stopping_time=4)
    sp = build_stacked(problem, dtype=jnp.float32)
    assert all(w is not None for w in sp.ab_bwd)   # fully uniform tree
    assert all(k is not None for k in sp.k_s)

    rng = np.random.default_rng(0)
    x_in = jnp.asarray(rng.standard_normal((sp.np_pad, sp.n)), sp.dtype)
    u_in = jnp.asarray(rng.standard_normal((sp.nl_pad, sp.m)), sp.dtype)
    x0j = jnp.asarray(x0, sp.dtype)

    with jax.default_matmul_precision("float32"):
        x_pl, u_pl = project_dynamics_pallas(sp, x_in, u_in, x0j,
                                             interpret=True)
        x_ref, u_ref = project_dynamics(sp, x_in, u_in, x0j)

    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_ref),
                               atol=1e-5, rtol=1e-5)
