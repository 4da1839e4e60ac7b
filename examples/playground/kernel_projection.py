#!/usr/bin/env python
"""Nullspace (kernel) projection demo.

Counterpart of the reference's scratchpad
(``/root/reference/playground/kernel.py:29-30``: project a point onto
ker(M) with a scipy nullspace basis + lstsq). The production solver never
solves a least-squares per iteration: it precomputes the orthogonal
projector ``Pi = I - M'(MM')^+M`` once and applies it as a batched matmul
(see ``raocp_tpu/core/stacked.py`` / ``ops/prox.py``). This demo shows the
two are the same map.
"""

import numpy as np
from scipy.linalg import null_space


def main():
    rng = np.random.default_rng(1)
    M = rng.standard_normal((3, 7))       # wide: nontrivial kernel
    v = rng.standard_normal(7)

    # reference approach: basis N of ker(M), coefficients by lstsq
    N = null_space(M)
    coef, *_ = np.linalg.lstsq(N, v, rcond=None)
    p_lstsq = N @ coef

    # framework approach: precomputed orthogonal projector
    Pi = np.eye(7) - M.T @ np.linalg.pinv(M @ M.T) @ M
    p_proj = Pi @ v

    print("‖M @ p‖∞      =", np.abs(M @ p_proj).max())
    print("‖p_lstsq - p_proj‖∞ =", np.abs(p_lstsq - p_proj).max())
    print("projector idempotent:", np.allclose(Pi @ Pi, Pi))
    print("projector symmetric: ", np.allclose(Pi, Pi.T))


if __name__ == "__main__":
    main()
