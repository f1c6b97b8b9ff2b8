"""Sparse logistic regression with all three SCORE methods
(/root/reference/README.md:96-188).

Data problem f(A, y, x) with l1 regularization; shows the closed-form
derivative hooks, the GGN model-output formulation and the GLM weight
hooks that unlock the fused Pallas matvec on TPU.
"""

import numpy as np

import scso_tpu as scso
from scso_tpu.models import losses, synthetic


def main():
    m, n = 2000, 256
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.05, n_active=16, seed=1234, dtype=np.float64,
        label01=True)

    problem = scso.Problem(
        A, y, x0, losses.logistic01_f, 0.01,
        grad_fx=losses.logistic01_grad,
        hess_fx=losses.logistic01_hess,
        out_fn=losses.sigmoid_out,
        grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w,
        ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM,
        dtype=np.float64,
    )
    hmu = scso.PHuberSmootherL1L2(1.0)

    for method in [
        scso.ProxNSCORE(solver="cg"),
        scso.ProxGGNSCORE(solver="cg"),
        scso.ProxLQNSCORE(m=10),
    ]:
        sol = scso.iterate(method, problem, "l1", hmu, max_epoch=200,
                           verbose=0)
        name, label = method.display()
        nnz = int((np.abs(sol.x) > 1e-8).sum())
        print(f"{label:16s} epochs={sol.epochs:4d} "
              f"obj={sol.obj[-1]:.8f} nnz={nnz}/{n}")
    return sol


if __name__ == "__main__":
    main()
