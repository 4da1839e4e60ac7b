"""Independent full-solve oracle: the CP solver cross-checked against a
generic NLP solver on the SAME problem, built from the SPEC alone.

The reference's strongest test cross-validates its projections against
cvxpy (``/root/reference/tests/test_cache.py:111-209``). cvxpy is not
available in this environment, so this module builds the full epigraph
program that the CP solver optimises —

    minimise      s_0
    subject to    x_0 = x_hat,   x_j = A_j x_i + B_j u_i          (dynamics)
                  E_i' y_i = tau_ch(i) + s_ch(i),  F_i' y_i = 0   (kernel)
                  b_i' y_i <= s_i,   y_i in K_i*                  (risk dual)
                  x_i'Q_j x_i + u_i'R_j u_i <= tau_j              (stage cost)
                  x_j'P_j x_j <= s_j                              (leaf cost)
                  lo <= [x_i; u_i] <= hi,  lo <= x_j <= hi        (boxes)

— directly from the spec's per-node accessors (dynamics / costs / risks /
constraints; NO reuse of ops/ or core/stacked code) and hands it to
``scipy.optimize.minimize(method="trust-constr")``, an interior-point
trust-region method that shares no code path, no formulation, and no
linear algebra with the Chambolle-Pock solver. Objective and trajectory
must then agree with a tightly converged CP solve.
"""

import numpy as np
import pytest
import scipy.optimize as sopt
import scipy.sparse as sps

from raocp_tpu.core.constraints import (Cartesian, NonnegativeOrthant, Real,
                                        SecondOrderCone, Zero)
from raocp_tpu.models import demo_problem, lqr_binary_problem
from raocp_tpu.solver import Solver


def _cone_components(cone):
    if isinstance(cone, Cartesian):
        return list(cone.cones)
    return [cone]


def epigraph_nlp_solve(spec, x_hat, gtol=1e-10, xtol=1e-12,
                       eval_primal=None):
    """Solve the RAOCP epigraph program with scipy's trust-constr.

    Returns (objective, x [N, n], u [NL, m]). Supports Rectangle / No
    constraints and risks whose cones are products of Real / Zero /
    NonnegativeOrthant / SecondOrderCone components (AVaR, TV, L2Ball...).

    ``eval_primal``: a solver ``Primal`` — skip the solve and instead
    evaluate THIS point against the oracle's own constraint system,
    returning (objective, max_equality_violation,
    max_inequality_violation). Used to adjudicate objective disagreements:
    if the CP point is feasible here with a lower objective, the NLP
    terminated suboptimally, not the CP solve.
    """
    tree = spec.tree
    N, NL = tree.num_nodes, tree.num_nonleaf_nodes
    anc = tree.ancestors
    n, m = spec.state_size, spec.control_size

    # variable layout: [x (N*n) | u (NL*m) | y (ragged) | tau (N) | s (N)]
    y_dim = [spec.risk_at_node(i).matrix_e.shape[0] for i in range(NL)]
    y_off = np.concatenate(([0], np.cumsum(y_dim)))
    ox, ou, oy = 0, N * n, N * n + NL * m
    ot = oy + int(y_off[-1])
    os_ = ot + N
    nv = os_ + N

    def xi(i):
        return slice(ox + i * n, ox + (i + 1) * n)

    def ui(i):
        return slice(ou + i * m, ou + (i + 1) * m)

    def yi(i):
        return slice(oy + int(y_off[i]), oy + int(y_off[i + 1]))

    rows_eq, lb_eq = [], []        # A v = b rows
    rows_in, lo_in, hi_in = [], [], []   # lo <= A v <= hi rows

    def eq_row(cols_vals, rhs):
        row = np.zeros(nv)
        for c, v in cols_vals:
            row[c] = v
        rows_eq.append(row)
        lb_eq.append(rhs)

    # x_0 = x_hat
    A0 = np.zeros((n, nv))
    A0[:, xi(0)] = np.eye(n)
    rows_eq.extend(A0)
    lb_eq.extend(np.asarray(x_hat, dtype=np.float64).reshape(-1))

    # dynamics x_j = A_j x_i + B_j u_i
    for j in range(1, N):
        i = int(anc[j])
        Aj = np.asarray(spec.state_dynamics_at_node(j), dtype=np.float64)
        Bj = np.asarray(spec.control_dynamics_at_node(j), dtype=np.float64)
        blk = np.zeros((n, nv))
        blk[:, xi(j)] = np.eye(n)
        blk[:, xi(i)] = -Aj
        blk[:, ui(i)] = -Bj
        rows_eq.extend(blk)
        lb_eq.extend(np.zeros(n))

    # risk rows per nonleaf node
    for i in range(NL):
        risk = spec.risk_at_node(i)
        E = np.asarray(risk.matrix_e, dtype=np.float64)
        F = np.asarray(risk.matrix_f, dtype=np.float64)
        b = np.asarray(risk.vector_b, dtype=np.float64).reshape(-1)
        ch = np.asarray(tree.children_of(i)).reshape(-1)
        c = ch.size
        # E' y = tau_ch + s_ch
        blk = np.zeros((c, nv))
        blk[:, yi(i)] = E.T
        for r, j in enumerate(ch):
            blk[r, ot + int(j)] = -1.0
            blk[r, os_ + int(j)] = -1.0
        rows_eq.extend(blk)
        lb_eq.extend(np.zeros(c))
        # F' y = 0 (F may have zero width)
        if F.shape[1] > 0:
            blk = np.zeros((F.shape[1], nv))
            blk[:, yi(i)] = F.T
            rows_eq.extend(blk)
            lb_eq.extend(np.zeros(F.shape[1]))
        # b' y <= s_i
        row = np.zeros(nv)
        row[yi(i)] = b
        row[os_ + i] = -1.0
        rows_in.append(row)
        lo_in.append(-np.inf)
        hi_in.append(0.0)
        # y in K* componentwise (NnOC* = NnOC, Zero* = Real, Real* = Zero,
        # SOC* = SOC); SOC components become nonlinear rows below
        off = oy + int(y_off[i])
        for comp in _cone_components(risk.cone):
            d = comp.dimension
            if isinstance(comp, NonnegativeOrthant):
                for r in range(d):
                    row = np.zeros(nv)
                    row[off + r] = 1.0
                    rows_in.append(row)
                    lo_in.append(0.0)
                    hi_in.append(np.inf)
            elif isinstance(comp, Real):           # dual = {0}
                for r in range(d):
                    eq_row([(off + r, 1.0)], 0.0)
            elif isinstance(comp, (Zero, SecondOrderCone)):
                pass                               # Zero* = Real (free);
                # SOC handled nonlinearly below
            else:
                raise NotImplementedError(type(comp).__name__)
            off += d

    # box constraints
    for i in range(NL):
        con = spec.nonleaf_constraint_at_node(i)
        if not con.is_active:
            continue
        lo = np.asarray(con.min, dtype=np.float64).reshape(-1)
        hi = np.asarray(con.max, dtype=np.float64).reshape(-1)
        blk = np.zeros((n + m, nv))
        blk[:n, xi(i)] = np.eye(n)
        blk[n:, ui(i)] = np.eye(m)
        rows_in.extend(blk)
        lo_in.extend(lo)
        hi_in.extend(hi)
    for j in range(NL, N):
        con = spec.leaf_constraint_at_node(j)
        if not con.is_active:
            continue
        lo = np.asarray(con.min, dtype=np.float64).reshape(-1)
        hi = np.asarray(con.max, dtype=np.float64).reshape(-1)
        blk = np.zeros((n, nv))
        blk[:, xi(j)] = np.eye(n)
        rows_in.extend(blk)
        lo_in.extend(lo)
        hi_in.extend(hi)

    constraints = [
        sopt.LinearConstraint(sps.csr_matrix(np.asarray(rows_eq)),
                              np.asarray(lb_eq), np.asarray(lb_eq)),
    ]
    if rows_in:
        constraints.append(
            sopt.LinearConstraint(sps.csr_matrix(np.asarray(rows_in)),
                                  np.asarray(lo_in), np.asarray(hi_in)))

    # nonlinear rows: stage-cost epigraphs, leaf-cost epigraphs, SOC
    # membership t^2 - ||z||^2 >= 0 (with t >= 0 linear rows added here)
    quads = []     # (Q, R, i, j): x_i'Qx_i + u_i'Ru_i - tau_j <= 0
    for j in range(1, N):
        cost = spec.nonleaf_cost_at_node(j)
        quads.append((np.asarray(cost.state_weights, dtype=np.float64),
                      np.asarray(cost.control_weights, dtype=np.float64),
                      int(anc[j]), j))
    leafs = []     # (P, j): x_j'Px_j - s_j <= 0
    for j in range(NL, N):
        cost = spec.leaf_cost_at_node(j)
        leafs.append((np.asarray(cost.state_weights, dtype=np.float64), j))
    socs = []      # (start, dim) absolute offsets of SOC y components
    for i in range(NL):
        off = oy + int(y_off[i])
        for comp in _cone_components(spec.risk_at_node(i).cone):
            d = comp.dimension
            if isinstance(comp, SecondOrderCone):
                socs.append((off, d))
            off += d
    if socs:
        extra = []
        for start, d in socs:
            row = np.zeros(nv)
            row[start + d - 1] = 1.0       # radial component is LAST
            extra.append(row)
        constraints.append(
            sopt.LinearConstraint(sps.csr_matrix(np.asarray(extra)),
                                  np.zeros(len(extra)),
                                  np.full(len(extra), np.inf)))

    nq, nl_, nsoc = len(quads), len(leafs), len(socs)

    def c_fun(v):
        out = np.empty(nq + nl_ + nsoc)
        for r, (Q, R, i, j) in enumerate(quads):
            x = v[xi(i)]
            u = v[ui(i)]
            out[r] = x @ Q @ x + u @ R @ u - v[ot + j]
        for r, (P, j) in enumerate(leafs):
            x = v[xi(j)]
            out[nq + r] = x @ P @ x - v[os_ + j]
        for r, (start, d) in enumerate(socs):
            z, t = v[start:start + d - 1], v[start + d - 1]
            out[nq + nl_ + r] = z @ z - t * t
        return out

    def c_jac(v):
        J = np.zeros((nq + nl_ + nsoc, nv))
        for r, (Q, R, i, j) in enumerate(quads):
            J[r, xi(i)] = 2.0 * (Q @ v[xi(i)])
            J[r, ui(i)] = 2.0 * (R @ v[ui(i)])
            J[r, ot + j] = -1.0
        for r, (P, j) in enumerate(leafs):
            J[nq + r, xi(j)] = 2.0 * (P @ v[xi(j)])
            J[nq + r, os_ + j] = -1.0
        for r, (start, d) in enumerate(socs):
            J[nq + nl_ + r, start:start + d - 1] = 2.0 * v[start:start + d - 1]
            J[nq + nl_ + r, start + d - 1] = -2.0 * v[start + d - 1]
        return J

    constraints.append(sopt.NonlinearConstraint(
        c_fun, -np.inf, 0.0, jac=c_jac))

    if eval_primal is not None:
        v = np.zeros(nv)
        v[ox:ox + N * n] = np.asarray(eval_primal.x)[:N].reshape(-1)
        v[ou:ou + NL * m] = np.asarray(eval_primal.u)[:NL].reshape(-1)
        y_flat = np.asarray(eval_primal.y)
        for i in range(NL):
            v[yi(i)] = y_flat[i, :y_dim[i]]
        v[ot:ot + N] = np.asarray(eval_primal.tau)[:N]
        v[os_:os_ + N] = np.asarray(eval_primal.s)[:N]
        A_eq = np.asarray(rows_eq)
        eq_viol = float(np.abs(A_eq @ v - np.asarray(lb_eq)).max())
        in_viol = 0.0
        if rows_in:
            img = np.asarray(rows_in) @ v
            in_viol = float(np.maximum(
                np.maximum(np.asarray(lo_in) - img,
                           img - np.asarray(hi_in)), 0.0).max())
        in_viol = max(in_viol, float(np.maximum(c_fun(v), 0.0).max()))
        return float(v[os_ + 0]), eq_viol, in_viol

    grad = np.zeros(nv)
    grad[os_ + 0] = 1.0
    res = sopt.minimize(
        lambda v: v[os_ + 0], np.zeros(nv), jac=lambda v: grad,
        hess=lambda v: sps.csr_matrix((nv, nv)),
        method="trust-constr", constraints=constraints,
        options=dict(gtol=gtol, xtol=xtol, maxiter=3000,
                     sparse_jacobian=True))
    assert res.status in (1, 2), (res.status, res.message)
    v = res.x
    return (float(v[os_ + 0]),
            v[ox:ox + N * n].reshape(N, n),
            v[ou:ou + NL * m].reshape(NL, m))


def _demo_tv():
    from raocp_tpu import TotalVariation
    return demo_problem(risk=TotalVariation(0.5))


# L2Ball (SOC ambiguity) is deliberately absent: its SOC membership rows
# push scipy's trust-constr past its evaluation budget at this size; the
# SOC-risk path is cross-checked by the dedicated SOCP oracle in
# tests/test_risks.py instead.
@pytest.mark.parametrize("make,cp_tol,obj_tol", [
    pytest.param(lambda: lqr_binary_problem(), 1e-6, 2e-5,
                 id="lqr-15-node"),
    pytest.param(lambda: demo_problem(), 1e-6, 2e-5, id="demo-32-node"),
    # the TV epigraph is harder for BOTH solvers: CP's first-order path
    # reaches xi ~ 3e-6 at 80k iterations and trust-constr terminates on
    # xtol ~3e-5 from the optimum — the agreement band is widened to
    # cover the NLP side's termination, still 2.5e-5 RELATIVE agreement
    # between two fully independent solvers
    pytest.param(_demo_tv, 5e-6, 1e-4, id="demo-32-node-total-variation"),
    # ragged-everywhere tree (no post-stopping chain): the oracle builder
    # is tree-shape-agnostic, so this also cross-checks the solver's
    # ragged gather/select paths (measured agreement ~4e-7)
    pytest.param(lambda: demo_problem(num_stages=3, stopping_time=3),
                 1e-6, 2e-5, id="demo-27-node-ragged"),
])
def test_full_solve_matches_independent_nlp(make, cp_tol, obj_tol):
    """The CP solution's objective (root epigraph value s_0) and state /
    input trajectories must match scipy's interior-point solve of the
    same epigraph program to ~1e-5 — the full-solve analogue of the
    reference's cvxpy cross-checks (test_cache.py:111-209)."""
    # NLP termination slop propagates into the trajectories (~6e-4 on the
    # TV case, adjudicated below as the NLP side's, not CP's)
    traj_tol = max(2e-4, 10.0 * obj_tol)
    problem, x0 = make()
    # ~1e-6 (three decades past the reference experiment's 1e-3) with
    # the auto over-relaxation: tight enough that the CP iterate error is
    # well inside the 2e-5 comparison band, loose enough that first-order
    # CP reaches it in ~30k iterations on the demo config
    res = Solver(problem).solve(x0, max_iters=80000, tol=cp_tol,
                                check_every=25, unroll=25, relax="auto")
    assert res.converged
    obj, x, u = epigraph_nlp_solve(problem, np.asarray(x0))
    assert obj == pytest.approx(res.objective, abs=obj_tol, rel=obj_tol)
    np.testing.assert_allclose(np.asarray(res.primal.x)[:x.shape[0]], x,
                               atol=traj_tol)
    # deep-stage inputs are near-flat directions of the objective (their
    # stage costs carry probability weights ~1e-2 against R = 0.1 I), so
    # the two solvers agree on them an order looser than on the states
    np.testing.assert_allclose(np.asarray(res.primal.u)[:u.shape[0]], u,
                               atol=max(1e-3, 50.0 * obj_tol))
    # adjudication: the CP point must be (near-)FEASIBLE in the oracle's
    # own constraint system — this catches a formulation drift between
    # the two solvers that a loose objective band could hide — and its
    # objective may undercut the NLP's only by what that infeasibility
    # can buy (first-order slack)
    cp_obj, eq_viol, in_viol = epigraph_nlp_solve(
        problem, np.asarray(x0), eval_primal=res.primal)
    assert cp_obj == pytest.approx(res.objective, abs=1e-12)
    assert eq_viol < 20.0 * cp_tol
    assert in_viol < 100.0 * cp_tol
    assert cp_obj >= obj - obj_tol - 10.0 * in_viol
