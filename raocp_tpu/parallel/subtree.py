"""Subtree partition: replicated-spine SPMD execution of the CP loop.

This is the stage-aligned sharding SURVEY §7(c) prescribes ("choose the
partition frontier so each shard owns complete subtrees and only the
root-side spine is replicated") — the scalable alternative to the flat
GSPMD node split in :mod:`raocp_tpu.parallel.sharding`, whose shard
boundaries cut stage slices and cost ~140 collectives/iteration in
resharding traffic (pinned in tests/test_sharding.py).

Layout. Pick a frontier stage ``f``:

* stages ``[0, f)`` (the spine) are REPLICATED on every device — a few
  nodes, recomputed redundantly;
* stage ``f`` is padded to a device-count multiple with ghost subtree
  roots, and every stage ``k >= f`` is split into ``D`` equal contiguous
  chunks. Because the tree is stage-major and branching below the frontier
  is uniform, device ``d``'s chunk of stage ``k+1`` is exactly the children
  of its chunk of stage ``k`` — each device owns complete subtrees, and
  every child reduction / parent expansion below the frontier is
  shard-local. Ghost rows (interior, per-device tails of uneven stages)
  carry zero data and provably stay zero through every op.

The ONE cross-device exchange per sweep is the frontier crossing: child
reductions from stage ``f`` to its (replicated) stage ``f-1`` parents
complete with a single psum (``ops.operator._frontier_psum``), and the
residual max-norms / power-iteration inner products reduce with one
pmax/psum. The production CP loop then carries ~5 collectives per
iteration — each spine-sized — instead of ~140 reshards
(tests/test_subtree.py pins the compiled budget).

Execution model: the whole jitted loop runs under ``jax.shard_map`` over a
1-D mesh. Inside, every array is the device-LOCAL block and the existing
batched kernels run unchanged (their static plan is the local index plan);
the StackedProblem's ``frontier``/``spmd_axis`` metadata activates the
psum/pmax hooks. The reference has no counterpart of any of this (SURVEY
§2: single-process NumPy).
"""

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raocp_tpu.core.modal import ModalMatrix
from raocp_tpu.core.stacked import StackedProblem, build_stacked
from raocp_tpu.core.variables import Dual, Primal
from raocp_tpu.parallel.sharding import AXIS

__all__ = ["SubtreeProblem", "build_subtree_problem", "choose_frontier",
           "subtree_eligible"]


# field -> node space (all sharded along dim 0 of the local block layout)
_NP_FIELDS = {"anc", "child_rank", "nz_mask", "node_mask", "A", "B", "P",
              "Abar", "riccati_cls"}
_NL_FIELDS = {"child_idx", "child_mask", "b_pad", "y_mask",
              "risk_free_rows", "risk_zero_rows", "risk_soc_rows",
              "risk_soc_tail", "nl_lo", "nl_hi", "nl_active", "nl_ball_c",
              "nl_ball_r", "Rinv", "K", "sumAPB", "Pi"}
_LF_FIELDS = {"l_lo", "l_hi", "l_active", "l_ball_c", "l_ball_r",
              "lf_half_mask"}
_MODAL_NP = {"Am", "Bm", "ABm", "sqrtQ", "sqrtR", "QRm"}
_MODAL_LF = {"sqrtP"}
_REPL_FIELDS = {"ab_fwd", "ab_bwd", "qr_fwd", "qr_bwd", "k_s", "rinv_s",
                "sumapb_s", "k_ms", "rinv_ms", "sumapb_ms", "nl_G", "l_G"}

# per-field ghost-row fill (default 0; bounds must stay inactive on ghosts)
_FILLS = {"nl_lo": -np.inf, "nl_hi": np.inf, "nl_ball_r": np.inf,
          "l_lo": -np.inf, "l_hi": np.inf, "l_ball_r": np.inf}


def _stage_structure(obj):
    """(num_stages, stage_start, stage_child) from a built StackedProblem,
    a bare ScenarioTree, or an RAOCP spec — frontier eligibility is a pure
    function of the stage structure, so Solver can decide the partition
    BEFORE paying for a stacked build (the offline Riccati/kernel
    factorisations dominate build time at production scale). All three
    carry the same ``stage_child`` (ScenarioTree.stage_child is the single
    source; build_stacked bakes it into the statics verbatim)."""
    src = obj.tree if hasattr(obj, "tree") else obj
    return (src.num_stages, tuple(int(v) for v in src.stage_start),
            tuple(src.stage_child))


def _frontier_candidates(obj):
    """Stages f such that branching is uniform from stage f-1 down (the
    position arithmetic of the padded forest needs it); spine stages above
    may be arbitrarily ragged."""
    ns, _, sc = _stage_structure(obj)
    ok_from = ns - 1                     # smallest j with sc[j:] all uniform
    for j in range(ns - 2, -1, -1):
        if sc[j] is None:
            break
        ok_from = j
    return [f for f in range(1, ns) if f - 1 >= ok_from]


def subtree_eligible(obj) -> bool:
    """True when the tree (or built problem) admits a subtree frontier."""
    return bool(_frontier_candidates(obj))


def choose_frontier(obj, num_devices: int) -> Optional[int]:
    """The frontier minimising total per-device work: replicated spine
    nodes + the padded subtree forest's share. Early frontiers shrink the
    spine; later ones shrink ghost padding — this cost model balances
    them. None when no stage admits a uniform-branching frontier.
    Accepts a StackedProblem, a ScenarioTree, or an RAOCP spec."""
    ns, ss, sc = _stage_structure(obj)
    widths = [ss[k + 1] - ss[k] for k in range(ns)]
    total = sum(widths)
    best, best_cost = None, None
    for f in _frontier_candidates(obj):
        W = -(-widths[f] // num_devices) * num_devices
        padded = 0
        for k in range(f, ns):
            if k > f:
                W = W * sc[k - 1]
            padded += W
        cost = (num_devices * sum(widths[:f]) + padded) / total
        if best is None or cost < best_cost - 1e-12:
            best, best_cost = f, cost
    return best


def _gather(arr, ids, fill=0.0):
    """Host gather arr[ids] with ``fill`` at ids == -1 (ghost rows)."""
    a = np.asarray(arr)
    flat = ids.reshape(-1)
    out_dtype = a.dtype
    out = np.full((flat.size,) + a.shape[1:],
                  np.asarray(fill).astype(out_dtype) if a.dtype != bool
                  else False, dtype=out_dtype)
    valid = flat >= 0
    out[valid] = a[flat[valid]]
    return out


@dataclasses.dataclass
class SubtreeProblem:
    """A mesh-partitioned RAOCP: local-plan StackedProblem with sharded
    block arrays, plus the host-side maps between global node ids and the
    (device, local-row) block layout."""

    sp: StackedProblem          # LOCAL static plan; [D * local, ...] arrays
    global_sp: StackedProblem   # the unpartitioned problem (validate etc.)
    in_spec: StackedProblem     # congruent PartitionSpec pytree for shard_map
    mesh: Mesh
    num_devices: int
    frontier: int
    l_np: int
    l_nl: int
    l_lf: int
    np_ids: np.ndarray          # [D, l_np] global node id, -1 on ghosts
    to_np: np.ndarray           # [N] -> flat row in [D*l_np] (spine: dev 0)
    to_nl: np.ndarray           # [NL] -> flat row in [D*l_nl]
    to_lf: np.ndarray           # [LF] -> flat row in [D*l_lf]
    _cache: dict = dataclasses.field(default_factory=dict)

    # -- iterate repacking ---------------------------------------------------

    def primal_to_global(self, z: Primal) -> Primal:
        x = np.asarray(z.x)
        u = np.asarray(z.u)
        y = np.asarray(z.y)
        tau = np.asarray(z.tau)
        s = np.asarray(z.s)
        return Primal(x=x[self.to_np], u=u[self.to_nl], y=y[self.to_nl],
                      tau=tau[self.to_np], s=s[self.to_np])

    def dual_to_global(self, eta: Dual) -> Dual:
        g = {k: np.asarray(v) for k, v in eta._asdict().items()}
        nl, npx, lf = self.to_nl, self.to_np, self.to_lf
        return Dual(e1=g["e1"][nl], e2=g["e2"][nl], e3=g["e3"][npx],
                    e4=g["e4"][npx], e5=g["e5"][npx], e6=g["e6"][npx],
                    e7=g["e7"][nl], e11=g["e11"][lf], e12=g["e12"][lf],
                    e13=g["e13"][lf], e14=g["e14"][lf])

    def _to_local(self, arr, space: str):
        ids = {"np": self.np_ids[:, :self.l_np],
               "nl": self.np_ids[:, :self.l_nl],
               "lf": self._lf_ids}[space]
        if space == "lf":
            return _gather(arr, ids)
        return _gather(np.asarray(arr), ids)

    @property
    def _lf_ids(self):
        ids = self.np_ids[:, self.l_nl:]
        NL = self.global_sp.num_nonleaf
        return np.where(ids >= 0, ids - NL, -1)

    def primal_to_local(self, z) -> Primal:
        return Primal(x=self._to_local(z.x, "np"),
                      u=self._to_local(z.u, "nl"),
                      y=self._to_local(z.y, "nl"),
                      tau=self._to_local(z.tau, "np"),
                      s=self._to_local(z.s, "np"))

    def dual_to_local(self, eta) -> Dual:
        sp_ = {"e1": "nl", "e2": "nl", "e3": "np", "e4": "np", "e5": "np",
               "e6": "np", "e7": "nl", "e11": "lf", "e12": "lf",
               "e13": "lf", "e14": "lf"}
        vals = eta._asdict() if hasattr(eta, "_asdict") else \
            dict(zip(Dual._fields, eta))
        return Dual(**{k: self._to_local(vals[k], s) for k, s in sp_.items()})

    def zero_primal_global_layout(self) -> Primal:
        """Host zeros in the [D * local, ...] block layout."""
        sp = self.sp
        D = self.num_devices
        dt = np.dtype(sp.dtype)
        return Primal(
            x=np.zeros((D * self.l_np, sp.n), dt),
            u=np.zeros((D * self.l_nl, sp.m), dt),
            y=np.zeros((D * self.l_nl, sp.Y), dt),
            tau=np.zeros((D * self.l_np,), dt),
            s=np.zeros((D * self.l_np,), dt))

    def zero_dual_global_layout(self) -> Dual:
        sp = self.sp
        D = self.num_devices
        dt = np.dtype(sp.dtype)
        return Dual(
            e1=np.zeros((D * self.l_nl, sp.Y), dt),
            e2=np.zeros((D * self.l_nl,), dt),
            e3=np.zeros((D * self.l_np, sp.n), dt),
            e4=np.zeros((D * self.l_np, sp.m), dt),
            e5=np.zeros((D * self.l_np,), dt),
            e6=np.zeros((D * self.l_np,), dt),
            e7=np.zeros((D * self.l_nl, sp.nl_rows), dt),
            e11=np.zeros((D * self.l_lf, sp.n), dt),
            e12=np.zeros((D * self.l_lf,), dt),
            e13=np.zeros((D * self.l_lf,), dt),
            e14=np.zeros((D * self.l_lf, sp.l_rows), dt))

    # -- shard-mapped entry points -------------------------------------------

    def _primal_spec(self):
        return tuple(P(AXIS) for _ in Primal._fields)

    def _dual_spec(self):
        return tuple(P(AXIS) for _ in Dual._fields)

    def power_iteration(self):
        """lambda_max(L'L) by SPMD power iteration over the mesh (SURVEY
        §2 item P4 on-device eigen estimation, here also on-mesh)."""
        if "power" not in self._cache:
            from raocp_tpu.solver import _power_iteration
            self._cache["power"] = jax.jit(jax.shard_map(
                _power_iteration, mesh=self.mesh,
                in_specs=(self.in_spec,), out_specs=(P(), P()),
                check_vma=False))
        return self._cache["power"](self.sp)

    def run_cp(self, z0, eta0, x0, alpha1, alpha2, tol, max_iters: int,
               check_every: int = 1, unroll: int = 1,
               adaptive: bool = False, relax: float = 1.0,
               log_every=None, k0=0):
        """The full production CP loop under shard_map. Accepts/returns
        iterates in the [D * local, ...] block layout. ``log_every``
        prints residuals from inside the loop via ``jax.debug.callback``
        (supported under shard_map); the logged err values are the
        post-pmax global max-norms, identical on every device, so only
        device 0's callback prints. ``k0`` (traced) offsets the logged
        iteration indices — chunked solves pass the completed-iteration
        count so printed indices are global."""
        key = ("run", max_iters, check_every, unroll, adaptive, relax,
               log_every)
        if key not in self._cache:
            from raocp_tpu.solver import _run_cp

            def body(sp_, z_, e_, x0_, a1_, a2_, tol_, k0_):
                return _run_cp(sp_, z_, e_, x0_, a1_, a2_, tol_,
                               max_iters, log_every=log_every,
                               check_every=check_every, unroll=unroll,
                               adaptive=adaptive, relax=relax, k0=k0_)

            self._cache[key] = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(self.in_spec, self._primal_spec(),
                          self._dual_spec(), P(), P(), P(), P(), P()),
                out_specs=(Primal(*self._primal_spec()),
                           Dual(*self._dual_spec()), P(), P(), P()),
                check_vma=False))
        return self._cache[key](self.sp, tuple(z0), tuple(eta0), x0,
                                alpha1, alpha2, tol,
                                jnp.asarray(k0, jnp.int32))


def build_subtree_problem(spec, mesh: Mesh, dtype=None,
                          offline: str = "host",
                          frontier: Optional[int] = None,
                          prebuilt: Optional[StackedProblem] = None
                          ) -> SubtreeProblem:
    """Partition a problem over a 1-D mesh with the replicated-spine
    subtree layout (module docstring). Raises ValueError when the tree has
    no uniform-branching frontier (ragged below every stage) — use the
    flat GSPMD path there. ``prebuilt`` reuses an existing pad_multiple=1
    build as the global problem instead of rebuilding."""
    g = prebuilt if prebuilt is not None else build_stacked(
        spec, dtype=dtype, pad_multiple=1, offline=offline)
    D = int(mesh.devices.size)
    f = choose_frontier(g, D) if frontier is None else int(frontier)
    if f is None:
        raise ValueError(
            "no subtree frontier exists (branching is ragged in every "
            "suffix of stages); use the flat node sharding instead")
    ns = g.num_stages
    ss = g.stage_start
    sc = g.stage_child
    widths = [ss[k + 1] - ss[k] for k in range(ns)]
    if any(sc[j] is None for j in range(f - 1, ns - 1)):
        raise ValueError(f"frontier {f} needs uniform branching from stage "
                         f"{f - 1} down")

    # local (per-device) stage widths and offsets
    lw = []
    for k in range(ns):
        if k < f:
            lw.append(widths[k])
        elif k == f:
            lw.append((-(-widths[f] // D) * D) // D)
        else:
            lw.append(lw[-1] * sc[k - 1])
    ls = [0]
    for w in lw:
        ls.append(ls[-1] + w)
    L_np, L_nl, L_lf = ls[ns], ls[ns - 1], lw[ns - 1]
    N, NL = g.num_nodes, g.num_nonleaf

    # -- per-device global-id map (−1 = ghost) -------------------------------
    np_ids = np.full((D, L_np), -1, np.int64)
    for k in range(ns):
        sl = slice(ls[k], ls[k + 1])
        if k < f:
            np_ids[:, sl] = np.arange(ss[k], ss[k + 1])[None, :]
        else:
            pos = (np.arange(D)[:, None] * lw[k]
                   + np.arange(lw[k])[None, :])          # padded stage pos
            np_ids[:, sl] = np.where(pos < widths[k], ss[k] + pos, -1)
    nl_ids = np_ids[:, :L_nl]
    lf_ids = np.where(np_ids[:, L_nl:] >= 0, np_ids[:, L_nl:] - NL, -1)

    # -- remapped index plans ------------------------------------------------
    anc_g = np.asarray(g.anc)
    cr_g = np.asarray(g.child_rank)
    anc_l = np.zeros((D, L_np), np.int64)
    cr_l = np.zeros((D, L_np), np.int64)
    for k in range(ns):
        sl = slice(ls[k], ls[k + 1])
        if k == 0:
            continue
        if k < f:
            # spine rows: local row == global id, so global tables apply
            anc_l[:, sl] = anc_g[ss[k]:ss[k + 1]][None, :]
            cr_l[:, sl] = cr_g[ss[k]:ss[k + 1]][None, :]
        elif k == f:
            ids_k = np_ids[:, sl]
            safe = np.clip(ids_k, 0, None)
            # parents are spine rows (local row == global id); ghosts point
            # at the first stage-(f-1) row and are masked where it matters
            anc_l[:, sl] = np.where(ids_k >= 0, anc_g[safe], ss[f - 1])
            cr_l[:, sl] = np.where(ids_k >= 0, cr_g[safe], 0)
        else:
            c = sc[k - 1]
            pos = np.arange(lw[k])
            anc_l[:, sl] = (ls[k - 1] + pos // c)[None, :]
            cr_l[:, sl] = (pos % c)[None, :]

    d_max = g.d_max
    ci_g = np.asarray(g.child_idx)
    cm_g = np.asarray(g.child_mask)
    ci_l = np.zeros((D, L_nl, d_max), np.int64)
    cm_l = np.zeros((D, L_nl, d_max))
    for k in range(ns - 1):
        sl = slice(ls[k], ls[k + 1])
        if k < f - 1:
            ci_l[:, sl] = ci_g[ss[k]:ss[k + 1]][None]
            cm_l[:, sl] = cm_g[ss[k]:ss[k + 1]][None]
        elif k == f - 1:
            # frontier parents (all spine, replicated): each device masks
            # in only the stage-f children it owns; a parent's children may
            # straddle devices — the psum completes the reduction
            c = sc[f - 1]
            pos = (np.arange(widths[f - 1])[:, None] * c
                   + np.arange(c)[None, :])              # global stage-f pos
            for d in range(D):
                owned = (pos >= d * lw[f]) & (pos < (d + 1) * lw[f])
                ci_l[d, sl, :c] = np.where(owned, ls[f] + pos - d * lw[f], 0)
                cm_l[d, sl, :c] = owned
        else:
            c = sc[k]
            loc = (ls[k + 1] + np.arange(lw[k])[:, None] * c
                   + np.arange(c)[None, :])              # local child rows
            ci_l[:, sl, :c] = loc[None]
            for d in range(D):
                pad_pos = d * lw[k + 1] + (loc - ls[k + 1])
                cm_l[d, sl, :c] = pad_pos < widths[k + 1]

    # -- value arrays, kinds, and specs --------------------------------------
    dtype_ = g.dtype
    values = {}
    kinds = {}

    def put(name, host, kind="node"):
        values[name] = host
        kinds[name] = kind

    put("anc", jnp.asarray(anc_l.reshape(-1), jnp.int32))
    put("child_rank", jnp.asarray(cr_l.reshape(-1), jnp.int32))
    put("child_idx", jnp.asarray(ci_l.reshape(D * L_nl, d_max), jnp.int32))
    put("child_mask", jnp.asarray(cm_l.reshape(D * L_nl, d_max), dtype_))
    put("node_mask", jnp.asarray(
        (np_ids >= 0).astype(np.float64).reshape(-1), dtype_))
    put("lf_half_mask", jnp.asarray(
        (lf_ids >= 0).astype(np.float64).reshape(-1), dtype_))

    def gathered(name, ids):
        arr = getattr(g, name)
        if arr is None:
            values[name] = None
            return
        fill = _FILLS.get(name, 0.0)
        host = _gather(arr, ids, fill)
        put(name, jnp.asarray(host))

    for name in _NP_FIELDS - {"anc", "child_rank", "node_mask"}:
        gathered(name, np_ids)
    for name in _NL_FIELDS - {"child_idx", "child_mask"}:
        gathered(name, nl_ids)
    for name in _LF_FIELDS - {"lf_half_mask"}:
        gathered(name, lf_ids)

    def modal_local(name, ids):
        mm = getattr(g, name)
        if mm is None:
            values[name] = None
            return
        values[name] = ModalMatrix(
            dense_m=None if mm.dense_m is None else
            jnp.asarray(_gather(mm.dense_m, ids)),
            modes=mm.modes,
            idx=None if mm.idx is None else
            jnp.asarray(_gather(mm.idx, ids, 0)))
        kinds[name] = "modal"

    for name in _MODAL_NP:
        modal_local(name, np_ids)
    for name in _MODAL_LF:
        modal_local(name, lf_ids)

    # stage tables are replicated; the four frontier-stage mode blocks are
    # forced ragged (None) so the frontier takes the masked gather + psum
    # path instead of a dense cross-device contraction
    for name in ("ab_fwd", "ab_bwd", "qr_fwd", "qr_bwd"):
        tab = getattr(g, name)
        values[name] = tuple(None if k == f - 1 else tab[k]
                             for k in range(len(tab)))
        kinds[name] = "repl"
    for name in ("k_s", "rinv_s", "sumapb_s", "k_ms", "rinv_ms",
                 "sumapb_ms", "nl_G", "l_G"):
        values[name] = getattr(g, name)
        kinds[name] = "repl"

    statics = dict(
        n=g.n, m=g.m, num_nodes=L_np, num_nonleaf=L_nl, num_leaf=L_lf,
        d_max=d_max, num_stages=ns, stage_start=tuple(ls),
        stage_child=tuple(None if k == f - 1 else sc[k]
                          for k in range(ns - 1)),
        np_pad=L_np, nl_pad=L_nl, lf_pad=L_lf, y_dim=g.y_dim,
        frontier=f, spmd_axis=AXIS, spmd_ndev=D)

    sp_host = StackedProblem(**statics, **values)

    # congruent sharding/spec pytrees (strings would be leaves too, so map
    # the kind over a replica of the value tree)
    def spec_of(name, leaf_kind):
        return P(AXIS) if leaf_kind == "node" else P()

    spec_updates = {}
    shard_updates = {}
    for name, val in values.items():
        if val is None:
            continue
        kind = kinds.get(name, "node")
        if kind == "modal":
            spec_updates[name] = ModalMatrix(
                dense_m=None if val.dense_m is None else P(AXIS),
                modes=None if val.modes is None else P(),
                idx=None if val.idx is None else P(AXIS))
            shard_updates[name] = ModalMatrix(
                dense_m=None if val.dense_m is None else
                NamedSharding(mesh, P(AXIS)),
                modes=None if val.modes is None else
                NamedSharding(mesh, P()),
                idx=None if val.idx is None else
                NamedSharding(mesh, P(AXIS)))
        elif kind == "repl":
            if isinstance(val, tuple):
                spec_updates[name] = tuple(
                    None if t is None else P() for t in val)
                shard_updates[name] = tuple(
                    None if t is None else NamedSharding(mesh, P())
                    for t in val)
            else:
                spec_updates[name] = P()
                shard_updates[name] = NamedSharding(mesh, P())
        else:
            spec_updates[name] = P(AXIS)
            shard_updates[name] = NamedSharding(mesh, P(AXIS))

    in_spec = dataclasses.replace(sp_host, **spec_updates)
    shard_tree = dataclasses.replace(sp_host, **shard_updates)
    sp_dev = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), sp_host, shard_tree)

    # -- global-id -> block-row maps -----------------------------------------
    to_np = np.zeros(N, np.int64)
    to_nl = np.zeros(NL, np.int64)
    to_lf = np.zeros(N - NL, np.int64)
    for k in range(ns):
        gl = np.arange(ss[k], ss[k + 1])
        if k < f:
            rows = gl                                     # device 0
        else:
            p = gl - ss[k]
            d = p // lw[k]
            rows = d * L_np + ls[k] + (p - d * lw[k])
        to_np[gl] = rows
        if k < ns - 1:
            if k < f:
                to_nl[gl] = gl
            else:
                to_nl[gl] = d * L_nl + ls[k] + (p - d * lw[k])
        else:
            p = gl - ss[k]
            d = p // lw[k]
            to_lf[gl - NL] = d * L_lf + (p - d * lw[k])

    return SubtreeProblem(
        sp=sp_dev, global_sp=g, in_spec=in_spec, mesh=mesh, num_devices=D,
        frontier=f, l_np=L_np, l_nl=L_nl, l_lf=L_lf, np_ids=np_ids,
        to_np=to_np, to_nl=to_nl, to_lf=to_lf)
