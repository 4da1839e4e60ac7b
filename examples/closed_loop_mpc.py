"""Closed-loop risk-averse MPC demo (BASELINE config 5 behaviour).

Runs the reference demo plant (3-mode Markov chain, 3 states / 2 inputs,
AVaR(0.95), box constraints) in closed loop: at every step the controller
observes the state and Markov mode, re-solves the RAOCP rooted at that mode
(warm-started from the previous solution, reusing the same compiled
Chambolle-Pock loop), applies the root control, and the plant transitions
under a freshly sampled mode.

Usage: python examples/closed_loop_mpc.py [num_steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from raocp_tpu.models import demo_mpc_controller


def main() -> None:
    num_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    controller, x0 = demo_mpc_controller()
    result = controller.run(x0, num_steps=num_steps, initial_mode=1, seed=0,
                            max_iters=3000, tol=1e-3)

    print(f"closed-loop run: {result.num_steps} steps, "
          f"{'all solves converged' if result.converged else 'NOT converged'}")
    print(f"realized modes: {result.modes.tolist()}")
    print(f"total realized cost: {result.total_cost:.6f}")
    print(f"CP iterations per solve: {result.iterations.tolist()}")
    print(f"solve seconds per step: "
          f"{np.round(result.solve_times, 3).tolist()}")
    print(f"state norm trajectory: "
          f"{np.round(np.linalg.norm(result.states, axis=1), 3).tolist()}")


if __name__ == "__main__":
    main()
