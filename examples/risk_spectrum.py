#!/usr/bin/env python
"""Compare risk measures on the demo problem: expectation -> AVaR ->
total-variation robust -> worst case.

Solves the reference demo configuration under a spectrum of risk measures
and prints the optimal nested cost (``result.objective``) plus an
independent host-side evaluation of the returned trajectory
(:func:`raocp_tpu.utils.evaluate.risk_value`). More risk aversion =>
higher optimal cost; AVaR(1) = TV(0) = MSD(0) = expectation.

Run: ``python examples/risk_spectrum.py`` (CPU float64 by default).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import raocp_tpu as r  # noqa: E402
from raocp_tpu.models import demo_problem  # noqa: E402
from raocp_tpu.utils.evaluate import risk_value  # noqa: E402


def main():
    risks = [
        ("expectation  AVaR(1.0)", r.AVaR(1.0)),
        ("             TV(0.0)", r.TotalVariation(0.0)),
        ("             MSD(0.0)", r.MeanUpperSemideviation(0.0)),
        ("             L2Ball(0.0)", r.L2Ball(0.0)),
        ("mild         MSD(0.5)", r.MeanUpperSemideviation(0.5)),
        ("             L2Ball(0.3)", r.L2Ball(0.3)),
        ("             TV(0.3)", r.TotalVariation(0.3)),
        ("             W1(0.2)", r.Wasserstein(0.2)),
        ("             AVaR(0.95)", r.AVaR(0.95)),
        ("strong       TV(1.0)", r.TotalVariation(1.0)),
        ("             AVaR(0.5)", r.AVaR(0.5)),
        ("worst case   AVaR(0.0)", r.AVaR(0.0)),
        ("             TV(2.0)", r.TotalVariation(2.0)),
        ("             L2Ball(1.5)", r.L2Ball(1.5)),
    ]
    print(f"{'risk measure':28s} {'iters':>6s} {'objective':>12s} "
          f"{'recursion':>12s}")
    for label, risk in risks:
        problem, x0 = demo_problem(risk=risk)
        solver = r.Solver(problem)
        res = solver.solve(x0, max_iters=20000, tol=1e-4)
        v0 = risk_value(problem, res.primal.x, res.primal.u)
        flag = "" if res.converged else "  (max_iters!)"
        print(f"{label:28s} {res.num_iters:6d} {res.objective:12.6f} "
              f"{v0:12.6f}{flag}")


if __name__ == "__main__":
    main()
