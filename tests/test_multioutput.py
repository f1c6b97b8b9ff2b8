"""Vector-valued model outputs through the dense GGN branches.

The reference's GGN step supports ŷ with ny outputs per sample — its
augmented system is built from the (m·ny)×n Jacobian
(prox-GGN-SCORE.jl:114-135, `qdm1 = m·ny`). Our dense branches flatten
J/residual/Q the same way (steps.py `_ggn_dense_direction`:
J.reshape(-1, n)); this exercises that surface end-to-end with a
multinomial (softmax) regression, whose Q = ∇²_ŷ loss is genuinely
non-diagonal — only the dense branches apply (the CG fast path assumes
elementwise losses).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso

M, P, K = 24, 6, 3  # samples, features, classes; n = P·K parameters
N = P * K
LAM = 1e-2
EPS = 1e-9


def softmax_out(A, x):
    """ŷ = softmax(A·W) rows, W = x.reshape(P, K) — shape (m, K)."""
    return jax.nn.softmax(A @ x.reshape(P, K), axis=-1)


def xent_loss(y, yhat):
    """(1/m)·Σ −y⊙log ŷ with one-hot y (m, K)."""
    return -jnp.mean(jnp.sum(y * jnp.log(yhat + EPS), axis=-1)) * K


def multinom_f(A, y, x):
    return xent_loss(y, softmax_out(A, x))


def make_problem(dtype=np.float64):
    rng = np.random.default_rng(11)
    A = rng.standard_normal((M, P)).astype(dtype)
    W_true = rng.standard_normal((P, K)).astype(dtype)
    logits = A @ W_true
    labels = np.argmax(logits + rng.gumbel(size=logits.shape), axis=-1)
    y = np.eye(K, dtype=dtype)[labels]
    x0 = (0.01 * rng.standard_normal(N)).astype(dtype)
    return scso.Problem(A, y, x0, multinom_f, LAM,
                        out_fn=softmax_out, loss_fn=xent_loss,
                        dtype=dtype)


class TestVectorOutputGGN:
    def test_ggn_pieces_shapes(self):
        prob = make_problem()
        x = jnp.asarray(prob.x0)
        yhat, J, residual, Q = prob.ggn_pieces(prob.A, prob.y, x)
        assert yhat.shape == (M, K)
        assert J.reshape(-1, N).shape == (M * K, N)
        assert np.asarray(residual).reshape(-1).shape == (M * K,)
        assert np.asarray(Q).reshape(M * K, M * K).shape == (M * K, M * K)

    @pytest.mark.parametrize("solver", ["dense_dual", "dense_primal"])
    def test_dense_branches_descend(self, solver):
        prob = make_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        s = scso.iterate(scso.ProxGGNSCORE(solver=solver, ss_type=3), prob,
                         "l1", sm, max_epoch=60, verbose=0)
        assert np.all(np.isfinite(s.x))
        # the solve makes real progress on the true objective
        assert s.obj[-1] < s.obj[0] - 0.1 * abs(s.obj[0])

    def test_matches_newton_ad(self):
        """Both GGN dense branches land near the AD full-Newton solution
        (softmax cross-entropy: GGN = Hessian at the optimum when the
        model interpolates; nearby otherwise)."""
        prob = make_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        f = lambda x: float(multinom_f(prob.A, prob.y, jnp.asarray(x))
                            + LAM * np.abs(x).sum())
        s_n = scso.iterate(scso.ProxNSCORE(solver="dense", ss_type=3),
                           prob, "l1", sm, max_epoch=120, verbose=0)
        s_g = scso.iterate(
            scso.ProxGGNSCORE(solver="dense_primal", ss_type=3), prob,
            "l1", sm, max_epoch=200, verbose=0)
        assert f(s_g.x) == pytest.approx(f(s_n.x), rel=2e-3)
