"""Safeguarded Anderson acceleration of the Chambolle-Pock fixed point.

The CP iteration is a (quasi-)nonexpansive fixed-point map T on the joint
primal-dual vector w = (z, eta). This module accelerates it with
SuperMann-style globalised Anderson acceleration (type II):

  r_k = T(w_k) - w_k
  gamma* = argmin || r_k - dR gamma ||_2      (small regularised LS)
  w_cand = w_k + r_k - (dW + dR) gamma*
  accept w_cand iff its fixed-point residual contracts vs the best seen
  (||r_cand|| <= theta * ||r_safe||), else fall back to the plain step
  w_{k+1} = T(w_k) — which guarantees the safeguarded iteration inherits
  the convergence of plain CP.

Everything (histories, the m x m normal equations, the candidate and
safeguard evaluations) stays on device inside one ``lax.while_loop``.

The reference repo only sketches this direction (playground/l-bfgs.py is a
standalone L-BFGS scratchpad; BASELINE.json lists "SuperMann/L-BFGS
accelerated iterations" as the target feature) — there is no accelerated
solver in the reference library itself.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from raocp_tpu.core.stacked import StackedProblem
from raocp_tpu.ops.operator import ell, ell_t
from raocp_tpu.solver import cp_iteration

__all__ = ["run_cp_anderson"]


def _t_map(sp, unravel, w_flat, alpha, x0):
    """One CP step as a fixed-point map on the flattened (z, eta) vector.
    Returns (T(w), xi_errors)."""
    z, eta = unravel(w_flat)
    Lz = ell(sp, z)
    LtEta = ell_t(sp, eta)
    z1, eta1, _, _, err, _ = cp_iteration(sp, z, eta, Lz, LtEta,
                                          alpha, alpha, x0)
    w1, _ = ravel_pytree((z1, eta1))
    return w1, err


@partial(jax.jit, static_argnames=("max_iters", "memory"))
def run_cp_anderson(sp: StackedProblem, z0, eta0, x0, alpha, tol,
                    max_iters: int, memory: int = 5, theta: float = 0.9,
                    reg: float = 1e-10):
    """Safeguarded Anderson-accelerated CP. Returns
    (z, eta, iters, t_evals, err, hist)."""
    w0, unravel = ravel_pytree((z0, eta0))
    dim = w0.shape[0]
    dt = sp.dtype

    t1, err0 = _t_map(sp, unravel, w0, alpha, x0)
    r0 = t1 - w0

    dW = jnp.zeros((memory, dim), dt)
    dR = jnp.zeros((memory, dim), dt)

    # carry: w, r (= T(w)-w), err (xi at w), histories, counters
    #   k: accepted iterations; evals: T evaluations; hc: valid history rows
    state = (w0, r0, err0, dW, dR, jnp.asarray(0, jnp.int32),
             jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.zeros((max_iters + 1, 3), dt))

    def cond(state):
        _, _, err, _, _, k, _, _, _ = state
        return jnp.logical_or(k == 0,
                              jnp.logical_and(jnp.max(err) > tol,
                                              k < max_iters + 1))

    def body(state):
        w, r, err, dW, dR, k, evals, hc, hist = state
        hist = hist.at[k].set(err)

        # Anderson candidate from the valid history rows
        valid = (jnp.arange(memory) < hc)[:, None]
        dRv = dR * valid
        dWv = dW * valid
        G = dRv @ dRv.T + reg * jnp.eye(memory, dtype=dt)
        gamma = jnp.linalg.solve(G, dRv @ r)
        w_cand = w + r - (dWv + dRv).T @ gamma

        t_cand, err_cand = _t_map(sp, unravel, w_cand, alpha, x0)
        r_cand = t_cand - w_cand
        accept = jnp.logical_and(
            hc > 0,
            jnp.linalg.norm(r_cand) <= theta * jnp.linalg.norm(r))

        def accepted(_):
            return w_cand, r_cand, err_cand, evals + 1

        def fallback(_):
            # plain CP step w+ = T(w) = w + r (already evaluated); one more
            # T eval to refresh the residual at the new point
            w_plain = w + r
            t_plain, err_plain = _t_map(sp, unravel, w_plain, alpha, x0)
            return w_plain, t_plain - w_plain, err_plain, evals + 2

        w_new, r_new, err_new, evals = jax.lax.cond(
            accept, accepted, fallback, None)

        # shift histories
        dW = jnp.roll(dW, 1, axis=0).at[0].set(w_new - w)
        dR = jnp.roll(dR, 1, axis=0).at[0].set(r_new - r)
        hc = jnp.minimum(hc + 1, memory)
        return (w_new, r_new, err_new, dW, dR, k + 1, evals, hc, hist)

    w, r, err, k, evals, hist = _strip(jax.lax.while_loop(cond, body, state))
    z, eta = unravel(w)
    return z, eta, k, evals, err, hist


def _strip(state):
    w, r, err, _, _, k, evals, _, hist = state
    return w, r, err, k, evals, hist
