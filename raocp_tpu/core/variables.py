"""Primal/dual variable pytrees of the Chambolle-Pock iteration.

The reference keeps primal/dual vectors as Python lists of per-node numpy
column vectors with segment offset tables (``cache.py:126-170``). Here each
segment is one stacked, padded device array so every per-node operation is a
single batched XLA op:

Primal z = (x, u, y, tau, s)  — reference segments 1..5 (``cache.py:126``)
Dual  eta = parts 1..7 (nonleaf/child) and 11..14 (leaf)
                              — reference segments (``cache.py:140``)

Padding invariant: padded slots (y/e1 columns beyond a node's real risk
rows, masked child-table entries, row 0 of the child-indexed parts
e3..e6) are identically zero at all times; every operator and prox map
preserves this, so norms and inner products match the reference exactly.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Primal", "Dual", "tree_inf_norm", "tree_dot", "tree_axpy",
           "tree_scale", "tree_sub", "tree_add", "make_packers"]


class Primal(NamedTuple):
    """Stacked primal variables.

    x:   [num_nodes, n]        states
    u:   [num_nonleaf, m]      controls
    y:   [num_nonleaf, Y]      risk duals (padded; Y = max risk rows,
                               e.g. 2*d_max + 1 for AVaR)
    tau: [num_nodes]           epigraph relaxation of stage costs
    s:   [num_nodes]           epigraph relaxation of risk recursion
    """
    x: jax.Array
    u: jax.Array
    y: jax.Array
    tau: jax.Array
    s: jax.Array


class Dual(NamedTuple):
    """Stacked dual variables (conic parts of eta).

    Parts 3-6 are indexed by the *child* node (row 0 unused and zero), as in
    the reference layout (``cache.py:141``). Parts 11-14 are indexed by leaf
    ordinal (node - num_nonleaf).

    e1:  [num_nonleaf, Y]  risk ambiguity dual (padded like y)
    e2:  [num_nonleaf]     nonnegativity of s_i - b'y_i
    e3:  [num_nodes, n]    sqrt(Q_j) x_i         (SOC head)
    e4:  [num_nodes, m]    sqrt(R_j) u_i         (SOC head)
    e5:  [num_nodes]       tau_j / 2             (SOC head)
    e6:  [num_nodes]       tau_j / 2             (SOC tail)
    e7:  [num_nonleaf, n+m] nonleaf box-constraint rows
    e11: [num_leaf, n]     sqrt(P) x_leaf        (SOC head)
    e12: [num_leaf]        s_leaf / 2            (SOC head)
    e13: [num_leaf]        s_leaf / 2            (SOC tail)
    e14: [num_leaf, n]     leaf box-constraint rows
    """
    e1: jax.Array
    e2: jax.Array
    e3: jax.Array
    e4: jax.Array
    e5: jax.Array
    e6: jax.Array
    e7: jax.Array
    e11: jax.Array
    e12: jax.Array
    e13: jax.Array
    e14: jax.Array


def make_packers(sp):
    """(pack_primal, unpack_primal, pack_dual, unpack_dual) for one problem.

    Packing the 5-leaf primal / 11-leaf dual into single flat vectors turns
    every linear combination, scaling, and norm of the CP iteration into ONE
    vector op instead of 5/11 — the iteration is op-launch-overhead-bound on
    small per-leaf arrays, so this is a direct throughput win. A pack is one
    concatenate; an unpack is static slices + reshapes that XLA fuses into
    the consumers. Zero-padding invariants carry over unchanged, so packed
    inf-norms equal the pytree norms exactly.
    """
    p_shapes = [(sp.np_pad, sp.n), (sp.nl_pad, sp.m), (sp.nl_pad, sp.Y),
                (sp.np_pad,), (sp.np_pad,)]
    d_shapes = [(sp.nl_pad, sp.Y), (sp.nl_pad,), (sp.np_pad, sp.n),
                (sp.np_pad, sp.m), (sp.np_pad,), (sp.np_pad,),
                (sp.nl_pad, sp.nl_rows), (sp.lf_pad, sp.n), (sp.lf_pad,),
                (sp.lf_pad,), (sp.lf_pad, sp.l_rows)]

    def _mk(shapes, cls):
        sizes = [int(np.prod(s)) for s in shapes]
        offs = [0]
        for sz in sizes:
            offs.append(offs[-1] + sz)

        def pack(tree):
            return jnp.concatenate([jnp.reshape(l, (-1,)) for l in tree])

        def unpack(vec):
            return cls(*(vec[offs[i]:offs[i + 1]].reshape(shapes[i])
                         for i in range(len(shapes))))

        return pack, unpack, offs[-1]

    pack_p, unpack_p, _ = _mk(p_shapes, Primal)
    pack_d, unpack_d, _ = _mk(d_shapes, Dual)
    return pack_p, unpack_p, pack_d, unpack_d


def tree_inf_norm(tree) -> jax.Array:
    """max |entry| over every leaf of a pytree (the reference's nested
    inf-norm of per-node inf-norms collapses to exactly this)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.max(jnp.stack([jnp.max(jnp.abs(l)) for l in leaves]))


def tree_dot(a, b) -> jax.Array:
    """Inner product <a, b> over matching pytrees."""
    parts = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jnp.sum(jnp.stack(jax.tree_util.tree_leaves(parts)))


def tree_axpy(alpha, x, y):
    """alpha * x + y."""
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def tree_scale(alpha, x):
    return jax.tree_util.tree_map(lambda xi: alpha * xi, x)


def tree_sub(a, b):
    return jax.tree_util.tree_map(lambda x, y: x - y, a, b)


def tree_add(a, b):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)
