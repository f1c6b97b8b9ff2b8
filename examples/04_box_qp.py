"""Box-constrained QP with indicator smoothing
(/root/reference/README.md:248-272).

minimize ½xᵀQx + cᵀx subject to −1 ≤ x ≤ 1, via the box-indicator
regularizer with pseudo-Huber / exponential / log-exp smoothers.
"""

import numpy as np

import scso_tpu as scso
from scso_tpu.models import losses, synthetic


def main():
    n = 10
    Q, c, x0 = synthetic.make_box_qp(n, seed=1234, dtype=np.float64)

    problem = scso.Problem(
        Q, c, x0, losses.qp_f, 1e-4,
        grad_fx=losses.qp_grad, hess_fx=losses.qp_hess,
        C_set=[-1.0, 1.0], dtype=np.float64)

    for hmu, name in [
        (scso.PHuberSmootherIndBox(-1.0, 1.0, 0.6), "PHuber"),
        (scso.ExponentialSmootherIndBox(-1.0, 1.0, 0.6), "Exponential"),
        (scso.LogExpSmootherIndBox(-1.0, 1.0, 0.6), "LogExp"),
    ]:
        sol = scso.iterate(scso.ProxNSCORE(), problem, "indbox", hmu,
                           alpha=0.8, max_epoch=200, verbose=0)
        inside = bool(np.all((sol.x >= -1 - 1e-9) & (sol.x <= 1 + 1e-9)))
        print(f"{name:12s} epochs={sol.epochs:4d} obj={sol.obj[-1]:.8f} "
              f"feasible={inside}")
    return sol


if __name__ == "__main__":
    main()
