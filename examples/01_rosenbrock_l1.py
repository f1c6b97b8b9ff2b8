"""l1-regularized Rosenbrock — the reference README quick start
(/root/reference/README.md:44-94).

Generic (data-free) problem: minimize 100(x2−x1²)² + (1−x1)² + λ‖x‖₁
with the proximal L-BFGS SCORE method and pseudo-Huber smoothing.
"""

import numpy as np

import scso_tpu as scso
from scso_tpu.models import losses


def main():
    x0 = np.array([0.2, -0.5])
    lam = 1e-8
    problem = scso.Problem(x0, losses.rosenbrock, lam, dtype=np.float64)

    method = scso.ProxLQNSCORE(use_prox=True, ss_type=1, m=10)
    hmu = scso.PHuberSmootherL1L2(1.0)
    sol = scso.iterate(method, problem, "l1", hmu, max_epoch=2000,
                       x_tol=1e-10, f_tol=1e-10, verbose=0)
    print(sol)
    print("x* =", sol.x, "(expected ≈ [1, 1])")
    return sol


if __name__ == "__main__":
    main()
