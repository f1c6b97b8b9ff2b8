"""Multinomial (softmax) regression — vector-valued model outputs.

The reference's GGN step handles ŷ with ny outputs per sample through
its (m·ny)×n augmented Jacobian (prox-GGN-SCORE.jl:114-135, qdm1 =
m·ny). Two routes exist here:

* the DENSE branches flatten J/residual/Q exactly like the reference
  (probability split; Q diagonal) — reference parity for small problems;
* the MATRIX-FREE route (`Problem.mglm` = `losses.multinom_mglm(k)`,
  logits split): per-sample k×k curvature actions (diag(p) − ppᵀ rowwise)
  inside the CG matvec — two (m×p)·(p×k) MXU matmuls per iteration and no
  (m·k)×n Jacobian, scaling to sizes where the dense route is infeasible.
  For this linear-in-x model the logits-split GGN is the EXACT Hessian,
  so ProxGGNSCORE(solver='cg') is full Newton-CG.
"""

import numpy as np

import scso_tpu as scso
from scso_tpu.models import losses, synthetic


def main():
    m, p, k = 400, 12, 4  # n = p·k = 48 parameters
    A, Y, x0, x_true = synthetic.make_multinomial_data(
        m, p, k, seed=5, dtype=np.float64)

    problem = scso.Problem(
        A, Y, x0, losses.multinom_f, 1e-3,
        grad_fx=losses.multinom_grad,
        out_fn=losses.softmax_out,
        loss_fn=losses.xent_loss,
        mglm=losses.multinom_mglm(k),
        sol=x_true,
        dtype=np.float64,
    )
    hmu = scso.PHuberSmootherL1L2(1.0)

    def accuracy(x):
        yhat = np.asarray(losses.softmax_out(problem.A, x))
        return float((yhat.argmax(-1) == np.asarray(problem.y).argmax(-1))
                     .mean())

    for method in [
        scso.ProxNSCORE(solver="dense", ss_type=3),
        scso.ProxGGNSCORE(solver="dense_primal", ss_type=3),
        scso.ProxGGNSCORE(solver="cg"),  # matrix-free logits-split GGN
        scso.ProxLQNSCORE(m=10),
    ]:
        sol = scso.iterate(method, problem, "l1", hmu, max_epoch=200,
                           verbose=0)
        _, label = method.display()
        mf = " (matrix-free mglm)" if getattr(method, "solver", "") == "cg" \
            else ""
        print(f"{label:16s} epochs={sol.epochs:4d} "
              f"obj={sol.obj[-1]:.8f} train_acc={accuracy(sol.x):.3f}{mf}")
    return sol


if __name__ == "__main__":
    main()
