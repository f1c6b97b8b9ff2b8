"""Vector-valued model outputs through the dense GGN branches.

The reference's GGN step supports ŷ with ny outputs per sample — its
augmented system is built from the (m·ny)×n Jacobian
(prox-GGN-SCORE.jl:114-135, `qdm1 = m·ny`). Our dense branches flatten
J/residual/Q the same way (steps.py `_ggn_dense_direction`:
J.reshape(-1, n)); this exercises that surface end-to-end with a
multinomial (softmax) regression. (With the probability-output split Q
is diagonal — the non-diagonal softmax curvature belongs to the logits
split — but the flattening surface is what matters here: the CG fast
path assumes scalar per-sample predictors, so vector outputs route
through the dense branches.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models.losses import (multinom_f, multinom_grad,
                                    softmax_out, xent_loss)
from scso_tpu.models.synthetic import make_multinomial_data

M, P, K = 24, 6, 3  # samples, features, classes; n = P·K parameters
N = P * K
LAM = 1e-2


def make_problem(dtype=np.float64):
    A, y, x0, _ = make_multinomial_data(M, P, K, seed=11, dtype=dtype)
    return scso.Problem(A, y, x0, multinom_f, LAM,
                        grad_fx=multinom_grad,
                        out_fn=softmax_out, loss_fn=xent_loss,
                        dtype=dtype)


class TestMultinomDerivatives:
    def test_grad_matches_ad(self):
        prob = make_problem()
        x = jnp.asarray(0.3 * np.random.default_rng(0).standard_normal(N))
        got = multinom_grad(prob.A, prob.y, x)
        ref = jax.grad(lambda v: multinom_f(prob.A, prob.y, v))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)

    def test_f_consistent_with_loss_of_out(self):
        """f(A,y,x) (logsumexp form) == loss_fn(y, out_fn(A,x)) — the
        consistency the GGN surface assumes."""
        prob = make_problem()
        x = jnp.asarray(0.3 * np.random.default_rng(1).standard_normal(N))
        f_direct = multinom_f(prob.A, prob.y, x)
        f_composed = xent_loss(prob.y, softmax_out(prob.A, x))
        np.testing.assert_allclose(float(f_direct), float(f_composed),
                                   rtol=1e-9)


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
        # GGN == Hessian only at interpolation; at this λ the two damped
        # -prox fixed points differ by ~0.4% in composite objective
        assert f(s_g.x) == pytest.approx(f(s_n.x), rel=1e-2)
