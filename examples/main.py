"""End-to-end demo: the reference's canonical experiment
(/root/reference/main.py) — 3-mode Markov chain, 3 states / 2 inputs,
quadratic costs, AVaR(0.95), box constraints — solved to 1e-3 in 937 CP
iterations."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from raocp_tpu import Solver
from raocp_tpu.models import demo_problem


def main() -> None:
    problem, x0 = demo_problem()
    print(problem.tree)
    solver = Solver(problem)
    status = solver.chock(initial_state=x0, max_iters=2000, tol=1e-3)
    result = solver.result
    print("success" if status == 0 else "fail")
    print(f"iterations: {result.num_iters}")
    print(f"final residuals (xi_0, xi_1, xi_2): {result.xi}")
    print(f"solve wall-clock: {result.solve_time:.3f}s "
          f"(includes jit compile on first call)")
    solver.plot_residuals(filename="residuals.png", show=False)
    solver.plot_solution(filename="solution.png", show=False)
    print("wrote residuals.png, solution.png")


if __name__ == "__main__":
    main()
