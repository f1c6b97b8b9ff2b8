"""Sparse Poisson regression (log-link GLM) with l1 SCORE methods.

A second canonical GLM beyond logistic regression: counts
y_i ~ Poisson(exp(a_i'x)), loss (1/m)·Σ(exp(z_i) − y_i·z_i). The
reference ships no built-in losses — users pass f and the GGN hooks
(problems.jl:61-81, prox-GGN-SCORE.jl:44-56) — so this demonstrates the
same model-agnostic surface here: closed-form derivative hooks, the GGN
out_fn/residual/Q-diagonal formulation, and the GLM product-form weights
(ŷ·res and ŷ²·qdiag cancel both exponentials — exact and
saturation-stable) that unlock the single-pass fused Pallas matvec.
"""

import numpy as np

import scso_tpu as scso
from scso_tpu.models import losses, synthetic


def main():
    m, n = 2000, 192
    A, y, x0, x_true = synthetic.make_sparse_poisson_data(
        m, n, density=0.08, n_active=12, seed=7, dtype=np.float64)

    problem = scso.Problem(
        A, y, x0, losses.poisson_f, 5e-2,
        grad_fx=losses.poisson_grad,
        hess_fx=losses.poisson_hess,
        out_fn=losses.exp_out,
        grad_fy=losses.poisson_ggn_residual,
        hess_fy_diag=losses.poisson_ggn_qdiag,
        loss_fn=losses.poisson_loss,
        hvp_w=losses.poisson_hvp_w,
        ggn_w=losses.poisson_ggn_w,
        glm=losses.POISSON_GLM,
        sol=x_true,
        dtype=np.float64,
    )
    hmu = scso.PHuberSmootherL1L2(1.0)

    for method in [
        scso.ProxNSCORE(solver="cg"),
        scso.ProxGGNSCORE(solver="cg"),
        scso.ProxLQNSCORE(m=10),
    ]:
        sol = scso.iterate(method, problem, "l1", hmu, max_epoch=300,
                           verbose=0)
        _, label = method.display()
        support = np.flatnonzero(np.abs(sol.x) > 1e-4)
        true_support = np.flatnonzero(np.abs(x_true) > 0)
        hits = len(set(support) & set(true_support))
        print(f"{label:16s} epochs={sol.epochs:4d} "
              f"obj={sol.obj[-1]:.8f} nnz={len(support)}/{n} "
              f"true-support recovered={hits}/{len(true_support)}")
    return sol


if __name__ == "__main__":
    main()
