"""μ/λ continuation (homotopy) — `scso.iterate_continuation`.

The reference defines an `update_mu` hook it never calls
(utils/utils.jl:37-39); this is its living counterpart: anneal the
smoothing parameter and/or the penalty to their targets with warm
starts, the final stage getting the full budget. μ and λ are traced, so
all non-final stages share ONE compiled program.

When to reach for it (measured on v5e, docs/STATUS.md round 4): NOT for
the default greedy-damped solver — greedy already takes full prox steps
whenever they decrease F, and continuation loses at both bench shapes.
It pays when greedy is OFF (ss_type 2/3, where the SCORE damping
genuinely over-throttles), and as glmnet-style λ-path warm starting
outside `parallel.sweep`.
"""

import numpy as np

import scso_tpu as scso
from scso_tpu.models import losses, synthetic


def main():
    m, n = 512, 128
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.2, n_active=12, seed=3, dtype=np.float64,
        label01=True)
    problem = scso.Problem(
        A, y, x0, losses.logistic01_f, 0.02,
        grad_fx=losses.logistic01_grad,
        out_fn=losses.sigmoid_out,
        grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w,
        ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM,
        dtype=np.float64,
    )
    method = scso.ProxGGNSCORE(solver="cg")
    hmu = scso.PHuberSmootherL1L2(1.0)
    kw = dict(x_tol=1e-10, f_tol=0.0, max_epoch=150, verbose=0,
              alpha=1.0)

    direct = scso.iterate(method, problem, "l1", hmu, **kw)

    # μ-homotopy: two loose-smoothing stages, then the target
    cont = scso.iterate_continuation(
        method, problem, "l1", hmu, mu_schedule=[16.0, 4.0, 1.0],
        stage_epochs=6, **kw)
    print("direct:       epochs", direct.epochs,
          "obj", f"{direct.obj[-1]:.10f}")
    for st in cont.cg_info["stages"]:
        print(f"  stage mu={st['mu']}: {st['epochs']} epochs")
    print("continuation: epochs", cont.epochs,
          "obj", f"{cont.obj[-1]:.10f}")
    assert np.allclose(cont.x, direct.x, atol=1e-6)  # same fixed point

    # λ-path warm starting (the sparser-first direction — keep l1/l2;
    # see the 'gl' trapping hazard in the API docs)
    cont_lam = scso.iterate_continuation(
        method, problem, "l1", hmu,
        lam_schedule=[0.1, 0.05, 0.02], stage_epochs=6, **kw)
    nnz = int((np.abs(cont_lam.x) > 1e-8).sum())
    print("lambda path:  epochs", cont_lam.epochs, f"nnz={nnz}/{n}")
    return cont


if __name__ == "__main__":
    main()
