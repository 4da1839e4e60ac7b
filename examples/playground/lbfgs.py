#!/usr/bin/env python
"""L-BFGS with a Wolfe line search, as one jitted JAX program.

Counterpart of the reference's standalone L-BFGS scratchpad
(``/root/reference/playground/l-bfgs.py:61-202``: two-loop recursion +
weak-Wolfe bisection, validated against cvxpy) — rebuilt as a pure
``lax.while_loop`` program with fixed-size history buffers, the same
limited-memory machinery the production accelerator uses
(:mod:`raocp_tpu.accel`).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _two_loop(grad, S, Y, rho, gamma, memory):
    """d = -H grad via the classic two-loop recursion (row 0 = newest pair;
    rho = 0 marks unused rows, which drop out of both loops)."""
    def bwd(i, carry):
        q, alphas = carry
        a = rho[i] * jnp.dot(S[i], q)
        return q - a * Y[i], alphas.at[i].set(a)

    q, alphas = jax.lax.fori_loop(
        0, memory, bwd, (grad, jnp.zeros((memory,), grad.dtype)))
    h = gamma * q

    def fwd(j, h):
        i = memory - 1 - j
        b = rho[i] * jnp.dot(Y[i], h)
        return h + S[i] * (alphas[i] - b)

    return -jax.lax.fori_loop(0, memory, fwd, h)


def _wolfe_bisection(f_grad, x, d, c1=1e-4, c2=0.9, max_ls=30):
    """Weak-Wolfe step size by bisection (the reference's line search,
    l-bfgs.py:61-104), as a ``lax.while_loop``."""
    f0, g0 = f_grad(x)
    slope = jnp.dot(g0, d)

    def cond(c):
        t, lo, hi, done, j = c
        return jnp.logical_and(jnp.logical_not(done), j < max_ls)

    def body(c):
        t, lo, hi, _, j = c
        ft, gt = f_grad(x + t * d)
        armijo = ft <= f0 + c1 * t * slope
        curv = jnp.dot(gt, d) >= c2 * slope
        done = jnp.logical_and(armijo, curv)
        hi = jnp.where(jnp.logical_not(armijo), t, hi)
        lo = jnp.where(jnp.logical_and(armijo, jnp.logical_not(curv)),
                       t, lo)
        t_new = jnp.where(jnp.isinf(hi), 2.0 * t, 0.5 * (lo + hi))
        t = jnp.where(done, t, t_new)
        return t, lo, hi, done, j + 1

    t, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1.0, x.dtype), jnp.asarray(0.0, x.dtype),
                     jnp.asarray(jnp.inf, x.dtype), jnp.asarray(False), 0))
    return t


@partial(jax.jit, static_argnames=("f_grad", "memory", "max_iters"))
def lbfgs(f_grad, x0, memory: int = 10, tol: float = 1e-8,
          max_iters: int = 500):
    """Minimize f; ``f_grad(x) -> (f, grad)``. Returns (x, iters)."""
    dim = x0.shape[0]
    dt = x0.dtype
    S = jnp.zeros((memory, dim), dt)
    Y = jnp.zeros((memory, dim), dt)
    rho = jnp.zeros((memory,), dt)

    def cond(c):
        x, S, Y, rho, gamma, k = c
        _, g = f_grad(x)
        return jnp.logical_and(jnp.max(jnp.abs(g)) > tol, k < max_iters)

    def body(c):
        x, S, Y, rho, gamma, k = c
        _, g = f_grad(x)
        d = _two_loop(g, S, Y, rho, gamma, memory)
        t = _wolfe_bisection(f_grad, x, d)
        x_new = x + t * d
        _, g_new = f_grad(x_new)
        s, y = x_new - x, g_new - g
        sy = jnp.dot(s, y)
        good = sy > 1e-12
        S = jnp.roll(S, 1, axis=0).at[0].set(jnp.where(good, s, 0.0))
        Y = jnp.roll(Y, 1, axis=0).at[0].set(jnp.where(good, y, 0.0))
        rho = jnp.roll(rho, 1).at[0].set(
            jnp.where(good, 1.0 / jnp.where(good, sy, 1.0), 0.0))
        gamma = jnp.where(good, sy / jnp.dot(y, y), gamma)
        return x_new, S, Y, rho, gamma, k + 1

    x, _, _, _, _, k = jax.lax.while_loop(
        cond, body, (x0, S, Y, rho, jnp.asarray(1.0, dt), 0))
    return x, k


def main():
    rng = np.random.default_rng(0)
    n = 50
    M = rng.standard_normal((n, n))
    H = jnp.asarray(M @ M.T + n * np.eye(n))
    g_lin = jnp.asarray(rng.standard_normal(n))

    def quad(x):
        return 0.5 * x @ H @ x + g_lin @ x, H @ x + g_lin

    x, k = lbfgs(quad, jnp.zeros(n))
    x_star = jnp.linalg.solve(H, -g_lin)
    print(f"quadratic: iters={int(k)}, |x - x*| = "
          f"{float(jnp.max(jnp.abs(x - x_star))):.2e}")

    def rosenbrock(x):
        f = jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
        return f, jax.grad(lambda v: jnp.sum(
            100.0 * (v[1:] - v[:-1] ** 2) ** 2 + (1 - v[:-1]) ** 2))(x)

    x, k = lbfgs(rosenbrock, jnp.zeros(10), max_iters=2000)
    print(f"rosenbrock: iters={int(k)}, |x - 1| = "
          f"{float(jnp.max(jnp.abs(x - 1.0))):.2e}")


if __name__ == "__main__":
    main()
