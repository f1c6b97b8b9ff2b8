"""Multinomial (softmax) regression — vector-valued model outputs.

The reference's GGN step handles ŷ with ny outputs per sample through
its (m·ny)×n augmented Jacobian (prox-GGN-SCORE.jl:114-135, qdm1 =
m·ny). Here the dense GGN branches flatten J/residual/Q the same way.
(With this probability-output split Q is in fact diagonal — the famous
non-diagonal softmax curvature belongs to the logits split; the dense
branches are used because the scalable CG fast path assumes a scalar
per-sample linear predictor, not (m, k) outputs.) ProxNSCORE and
ProxLQNSCORE run on the closed-form gradient as usual.
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
        scso.ProxLQNSCORE(m=10),
    ]:
        sol = scso.iterate(method, problem, "l1", hmu, max_epoch=200,
                           verbose=0)
        _, label = method.display()
        print(f"{label:16s} epochs={sol.epochs:4d} "
              f"obj={sol.obj[-1]:.8f} train_acc={accuracy(sol.x):.3f}")
    return sol


if __name__ == "__main__":
    main()
