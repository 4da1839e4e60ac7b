"""Accelerated fixed-point iterations for the Chambolle-Pock map.

The CP iteration is a (quasi-)nonexpansive fixed-point map T on the joint
primal-dual vector w = (z, eta). This module provides two on-device
accelerators of that fixed point, both globalised so they inherit the
convergence of plain CP:

* :func:`run_cp_anderson` — safeguarded Anderson acceleration (type II)
* :func:`run_cp_supermann` — SuperMann-style globalisation with
  limited-memory Broyden quasi-Newton directions on the residual map

Anderson acceleration works as follows:

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
from raocp_tpu.solver import cp_iteration, \
    _with_matmul_precision as _precision

__all__ = ["run_cp_anderson", "run_cp_supermann"]


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
@_precision
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


@partial(jax.jit, static_argnames=("max_iters", "memory", "ls_max"))
@_precision
def run_cp_supermann(sp: StackedProblem, z0, eta0, x0, alpha, tol,
                     max_iters: int, memory: int = 10, ls_max: int = 1,
                     c0: float = 0.99, c1: float = 0.99, q_eps: float = 0.95,
                     beta: float = 0.5):
    """SuperMann-style globalised quasi-Newton acceleration of the CP
    fixed point with limited-memory (type-I) Broyden directions.

    Directions approximate the inverse Jacobian of the residual map
    R(w) = w - T(w) with rank-one Broyden updates
    ``H+ = H + ((s - H y) y') / (y'y)``, kept in limited-memory product
    form ``H = I + sum_i u_i y_i'`` (apply and push are O(memory x dim)
    vector ops, all on device). Broyden — not L-BFGS — is the right
    quasi-Newton family here: the Jacobian of a primal-dual fixed-point
    residual is nonsymmetric, and this is the direction family the
    SuperMann paper itself pairs with the scheme (Themelis & Patrinos
    2019). Globalisation follows SuperMann's safe update rules:

    * **K0 (blind)**: while the residual keeps linearly decreasing
      (``|R w| <= c0 * eta_safe``), take the full quasi-Newton step.
    * **K1 (educated)**: otherwise backtrack ``tau`` until the candidate
      contracts the residual (``|R w_c| <= c1 |R w|``).
    * **Fallback**: if the line search fails, take the plain CP step
      ``w+ = T(w)`` — so the safeguarded iteration inherits plain CP's
      convergence (the reference algorithm without acceleration,
      reference ``solver.py:124-161``).

    The hyperplane-projection (K2/GKM) update of full SuperMann is omitted
    deliberately: it is only Fejér-monotone in the CP preconditioner metric,
    not the Euclidean one used here; the K0/K1 + fallback subset is metric
    agnostic. Everything — histories, direction recursions, line search —
    stays on device inside one ``lax.while_loop``.

    Returns (z, eta, iters, t_evals, err, hist).
    """
    w0, unravel = ravel_pytree((z0, eta0))
    dim = w0.shape[0]
    dt = sp.dtype

    t0, err0 = _t_map(sp, unravel, w0, alpha, x0)
    r0 = w0 - t0                       # residual R(w) = w - T(w)
    nr0 = jnp.linalg.norm(r0)

    U = jnp.zeros((memory, dim), dt)   # Broyden vectors (row 0 oldest kept)
    Y = jnp.zeros((memory, dim), dt)   # y_i = r_{i+1} - r_i
    valid = jnp.zeros((memory,), dt)   # 1.0 = row in use

    def _apply_h(U, Y, valid, v):
        """H v = v + sum_i u_i (y_i . v) over valid rows."""
        return v + U.T @ ((Y @ v) * valid)

    # carry: w, r, err, U, Y, valid, eta_safe, r_safe, eps, k, evals, hist
    # (eta_safe gates K0; r_safe + summable eps gate K1)
    state = (w0, r0, err0, U, Y, valid, nr0, nr0, nr0,
             jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
             jnp.zeros((max_iters + 1, 3), dt))

    def cond(state):
        err, k = state[2], state[9]
        return jnp.logical_or(k == 0,
                              jnp.logical_and(jnp.max(err) > tol,
                                              k < max_iters + 1))

    def body(state):
        (w, r, err, U, Y, valid, eta_safe, r_safe, eps, k, evals,
         hist) = state
        hist = hist.at[k].set(err)
        norm_r = jnp.linalg.norm(r)

        d = -_apply_h(U, Y, valid, r)

        def blind(_):
            # K0: accept w + d without a test; eta_safe tightens
            w_n = w + d
            t_n, err_n = _t_map(sp, unravel, w_n, alpha, x0)
            return (w_n, w_n - t_n, err_n, norm_r, r_safe,
                    jnp.asarray(1, jnp.int32))

        def plain_step(j):
            # plain CP step w+ = T(w) = w - r; refresh the residual
            w_p = w - r
            t_p, err_p = _t_map(sp, unravel, w_p, alpha, x0)
            return w_p, w_p - t_p, err_p, eta_safe, r_safe, j + 1

        def line_search(_):
            # K1 is admissible only under the (loop-invariant) safeguard
            # |R w| <= r_safe; when it fails, no backtracking step can be
            # accepted, so go straight to the fallback instead of burning
            # ls_max T-map evaluations
            def attempt(_):
                # backtrack tau until |R(w + tau d)| <= c1 |R w|
                cand0 = (jnp.ones((), dt), w, r, err,
                         jnp.asarray(False), jnp.asarray(0, jnp.int32))

                def ls_cond(c):
                    tau, _, _, _, ok, j = c
                    return jnp.logical_and(jnp.logical_not(ok), j < ls_max)

                def ls_body(c):
                    tau, _, _, _, _, j = c
                    w_c = w + tau * d
                    t_c, err_c = _t_map(sp, unravel, w_c, alpha, x0)
                    r_c = w_c - t_c
                    ok = jnp.linalg.norm(r_c) <= c1 * norm_r
                    return (tau * beta, w_c, r_c, err_c, ok, j + 1)

                tau, w_c, r_c, err_c, ok, j = jax.lax.while_loop(
                    ls_cond, ls_body, cand0)

                def accepted(_):
                    return (w_c, r_c, err_c, eta_safe,
                            jnp.linalg.norm(r_c) + eps, j)

                return jax.lax.cond(ok, accepted,
                                    lambda _: plain_step(j), None)

            return jax.lax.cond(
                norm_r <= r_safe, attempt,
                lambda _: plain_step(jnp.asarray(0, jnp.int32)), None)

        w_n, r_n, err_n, eta_n, rsafe_n, ev = jax.lax.cond(
            norm_r <= c0 * eta_safe, blind, line_search, None)

        # Broyden push: u = (s - H y) / (y.y); skip degenerate pairs
        s = w_n - w
        y = r_n - r
        yy = jnp.dot(y, y)
        good = yy > 1e-30
        u = (s - _apply_h(U, Y, valid, y)) / jnp.where(good, yy, 1.0)
        U = jnp.roll(U, 1, axis=0).at[0].set(jnp.where(good, u, 0.0))
        Y = jnp.roll(Y, 1, axis=0).at[0].set(y)
        valid = jnp.roll(valid, 1).at[0].set(jnp.where(good, 1.0, 0.0))

        return (w_n, r_n, err_n, U, Y, valid, eta_n, rsafe_n,
                eps * q_eps, k + 1, evals + ev, hist)

    out = jax.lax.while_loop(cond, body, state)
    w, r, err, k, evals, hist = (out[0], out[1], out[2], out[9], out[10],
                                 out[11])
    z, eta = unravel(w)
    return z, eta, k, evals, err, hist
