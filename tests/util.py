"""Shared test helpers: random variables respecting the padding invariants,
and independent numpy oracles for the offline factorisation and prox maps."""

import numpy as np
import scipy.linalg

from raocp_tpu.core.variables import Dual, Primal


def _space_masks(sp):
    """(node, nonleaf, leaf) 0/1 masks of the REAL rows of each padded space."""
    mn = np.zeros(sp.np_pad)
    mn[:sp.num_nodes] = 1.0
    mnl = np.zeros(sp.nl_pad)
    mnl[:sp.num_nonleaf] = 1.0
    mlf = np.zeros(sp.lf_pad)
    mlf[:sp.num_leaf] = 1.0
    return mn, mnl, mlf


def random_primal(sp, rng) -> Primal:
    """Random primal with zeros exactly on the padded coordinates."""
    mn, mnl, _ = _space_masks(sp)
    y = rng.standard_normal((sp.nl_pad, sp.Y)) * np.asarray(sp.y_mask)
    return Primal(
        x=rng.standard_normal((sp.np_pad, sp.n)) * mn[:, None],
        u=rng.standard_normal((sp.nl_pad, sp.m)) * mnl[:, None],
        y=y,
        tau=rng.standard_normal(sp.np_pad) * np.asarray(sp.nz_mask),
        s=rng.standard_normal(sp.np_pad) * mn,
    )


def random_dual(sp, rng) -> Dual:
    """Random dual with zeros on padded coordinates / dummy rows."""
    mn, mnl, mlf = _space_masks(sp)
    nz = np.asarray(sp.nz_mask)
    nl_act = np.asarray(sp.nl_active)
    l_act = np.asarray(sp.l_active)
    return Dual(
        e1=rng.standard_normal((sp.nl_pad, sp.Y)) * np.asarray(sp.y_mask),
        e2=rng.standard_normal(sp.nl_pad) * mnl,
        e3=rng.standard_normal((sp.np_pad, sp.n)) * nz[:, None],
        e4=rng.standard_normal((sp.np_pad, sp.m)) * nz[:, None],
        e5=rng.standard_normal(sp.np_pad) * nz,
        e6=rng.standard_normal(sp.np_pad) * nz,
        e7=rng.standard_normal((sp.nl_pad, sp.nl_rows)) * nl_act[:, None],
        e11=rng.standard_normal((sp.lf_pad, sp.n)) * mlf[:, None],
        e12=rng.standard_normal(sp.lf_pad) * mlf,
        e13=rng.standard_normal(sp.lf_pad) * mlf,
        e14=rng.standard_normal((sp.lf_pad, sp.l_rows)) * l_act[:, None],
    )


def tree_dot_np(a, b) -> float:
    return float(sum(np.vdot(np.asarray(x), np.asarray(y))
                     for x, y in zip(a, b)))


def dynamics_projection_oracle(spec, x_hat, u_hat, x0):
    """Exact dense least-squares oracle for the dynamics projection.

    The projection of (x_hat, u_hat) onto
    {x_0 = x0, x_j = A_j x_parent + B_j u_parent} reduces to an unconstrained
    least squares in u (x is an affine function of u given x0). Solved with
    one dense lstsq — independent of the DP sweep under test.
    """
    tree = spec.tree
    N = tree.num_nodes
    NL = tree.num_nonleaf_nodes
    n = spec.state_size
    m = spec.control_size

    # x_i = base_i + sum_k M[i][k] u_k   (affine in the stacked u)
    base = np.zeros((N, n))
    M = np.zeros((N, n, NL * m))
    base[0] = x0
    for j in range(1, N):
        i = tree.ancestor_of(j)
        A = spec.state_dynamics_at_node(j)
        B = spec.control_dynamics_at_node(j)
        base[j] = A @ base[i]
        M[j] = A @ M[i]
        M[j][:, i * m:(i + 1) * m] += B

    # minimise ||x(u) - x_hat||^2 + ||u - u_hat||^2
    # rows: all states except the fixed x_0, plus the identity on u
    G = np.vstack([M[j] for j in range(1, N)] + [np.eye(NL * m)])
    r = np.concatenate([(x_hat[j] - base[j]) for j in range(1, N)]
                       + [u_hat.reshape(-1)])
    u_opt, *_ = np.linalg.lstsq(G, r, rcond=None)
    x_opt = base + np.einsum("iak,k->ia", M, u_opt)
    return x_opt, u_opt.reshape(NL, m)


def kernel_projection_oracle(spec, y, tau, s):
    """Reference-style kernel projection oracle: per-node null-space basis via
    scipy + lstsq (parity with reference cache.py:290-317)."""
    tree = spec.tree
    y_new = [None] * tree.num_nonleaf_nodes
    tau_new = np.array(tau, copy=True)
    s_new = np.array(s, copy=True)
    for i in range(tree.num_nonleaf_nodes):
        risk = spec.risk_at_node(i)
        children = tree.children_of(i)
        c = len(children)
        eye = np.eye(c)
        zeros = np.zeros((risk.matrix_f.shape[1], c))
        M = np.vstack((np.hstack((risk.matrix_e.T, -eye, -eye)),
                       np.hstack((risk.matrix_f.T, zeros, zeros))))
        ns = scipy.linalg.null_space(M)
        full = np.concatenate([y[i], tau[children], s[children]])
        proj = ns @ np.linalg.lstsq(ns, full, rcond=None)[0]
        assert np.linalg.norm(M @ proj, np.inf) < 1e-9
        R = risk.matrix_e.shape[0]
        y_new[i] = proj[:R]
        tau_new[children] = proj[R: R + c]
        s_new[children] = proj[R + c:]
    return y_new, tau_new, s_new


def riccati_oracle(spec):
    """Per-node numpy re-implementation of the offline factorisation
    (follows reference cache.py:207-233 node-by-node)."""
    tree = spec.tree
    N = tree.num_nodes
    NL = tree.num_nonleaf_nodes
    n = spec.state_size
    m = spec.control_size
    P = [np.eye(n) for _ in range(N)]
    K = [None] * NL
    Abar = [None] * N
    for i in reversed(range(NL)):
        children = tree.children_of(i)
        sum_r = sum(spec.control_dynamics_at_node(j).T @ P[j]
                    @ spec.control_dynamics_at_node(j) for j in children)
        sum_k = sum(spec.control_dynamics_at_node(j).T @ P[j]
                    @ spec.state_dynamics_at_node(j) for j in children)
        r_tilde = np.eye(m) + sum_r
        cho = scipy.linalg.cho_factor(r_tilde)
        K[i] = scipy.linalg.cho_solve(cho, -sum_k)
        sum_p = 0
        for j in children:
            Abar[j] = (spec.state_dynamics_at_node(j)
                       + spec.control_dynamics_at_node(j) @ K[i])
            sum_p = sum_p + Abar[j].T @ P[j] @ Abar[j]
        P[i] = np.eye(n) + K[i].T @ K[i] + sum_p
    return P, K, Abar
