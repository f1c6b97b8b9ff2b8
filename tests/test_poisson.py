"""Poisson regression family: derivative correctness vs AD, GLM
fast-path equivalence, and end-to-end solves with all three methods.

The reference ships no built-in losses (users pass f — problems.jl:61-81)
but its GGN interface is model-agnostic through out_fn/grad_fy/hess_fy;
this family exercises that surface (and our single-z GLM fast path) on a
second canonical GLM beyond logistic/least-squares.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic

M, N = 80, 24
LAM = 1e-2


def make_poisson_problem(dtype=np.float64, glm=True, ad_only=False):
    A, y, x0, _ = synthetic.make_sparse_poisson_data(
        M, N, density=0.2, n_active=6, seed=3, dtype=dtype)
    kw = {}
    if ad_only:
        # only the model output + loss: jac/residual/Q come from AD (the
        # reference's ForwardDiff route, prox-GGN-SCORE.jl:53-56)
        kw.update(out_fn=losses.exp_out, loss_fn=losses.poisson_loss)
    else:
        kw.update(
            grad_fx=losses.poisson_grad,
            hess_fx=losses.poisson_hess,
            out_fn=losses.exp_out,
            grad_fy=losses.poisson_ggn_residual,
            hess_fy_diag=losses.poisson_ggn_qdiag,
            loss_fn=losses.poisson_loss,
            hvp_w=losses.poisson_hvp_w,
            ggn_w=losses.poisson_ggn_w,
        )
    if glm:
        kw["glm"] = losses.POISSON_GLM
    return scso.Problem(A, y, x0, losses.poisson_f, LAM, dtype=dtype, **kw)


class TestPoissonDerivatives:
    def setup_method(self):
        self.A, self.y, self.x0, _ = synthetic.make_sparse_poisson_data(
            M, N, density=0.2, n_active=6, seed=3, dtype=np.float64)
        self.A = jnp.asarray(self.A)
        self.y = jnp.asarray(self.y)
        self.x = jnp.asarray(self.x0) + 0.05

    def test_grad_matches_ad(self):
        want = jax.grad(lambda v: losses.poisson_f(self.A, self.y, v))(
            self.x)
        got = losses.poisson_grad(self.A, self.y, self.x)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_hess_and_hvp_w_match_ad(self):
        H = jax.hessian(lambda v: losses.poisson_f(self.A, self.y, v))(
            self.x)
        np.testing.assert_allclose(
            losses.poisson_hess(self.A, self.y, self.x), H, rtol=1e-10)
        v = jnp.linspace(-1, 1, N)
        w = losses.poisson_hvp_w(self.A, self.y, self.x)
        np.testing.assert_allclose(
            self.A.T @ (w * (self.A @ v)), H @ v, rtol=1e-10)

    def test_glm_product_forms_match_naive(self):
        """ggn_rw = ŷ·res and ggn_w = ŷ²·qdiag (the exp cancellations)."""
        g = losses.POISSON_GLM
        z = self.A @ self.x
        yhat = g.link(z)
        np.testing.assert_allclose(
            g.ggn_rw(self.y, z), g.dlink(z) * g.res(self.y, yhat),
            rtol=1e-12)
        np.testing.assert_allclose(
            g.ggn_w(self.y, z),
            g.dlink(z) ** 2 * g.qdiag(self.y, yhat), rtol=1e-12)

    def test_ggn_residual_qdiag_are_loss_derivatives(self):
        yhat = losses.exp_out(self.A, self.x)
        want_r = jax.grad(lambda v: losses.poisson_loss(self.y, v))(yhat)
        got_r = losses.poisson_ggn_residual(self.A, self.y, yhat)
        np.testing.assert_allclose(got_r, want_r, rtol=1e-12)
        want_q = jnp.diag(
            jax.hessian(lambda v: losses.poisson_loss(self.y, v))(yhat))
        got_q = losses.poisson_ggn_qdiag(self.A, self.y, yhat)
        np.testing.assert_allclose(got_q, want_q, rtol=1e-10)


class TestPoissonSolves:
    def test_newton_dense_reaches_stationarity(self):
        prob = make_poisson_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        s = scso.iterate(scso.ProxNSCORE(solver="dense"), prob, "l1", sm,
                         max_epoch=60, verbose=0)
        assert np.all(np.isfinite(s.x))
        # prox-stationarity: x is a fixed point of the damped prox step
        assert s.pri_res_norm[-1] < 1e-8

    def test_ggn_cg_matches_newton_dense(self):
        """GGN on Poisson needs the Armijo step (ss_type=3): the GGN
        curvature w = y/m underestimates the true Hessian w = ŷ/m
        wherever ŷ ≫ y, so the fixed ss=0.5 overshoots and diverges (the
        reference inherits the same math). With the linesearch it
        converges to a damped-prox fixed point whose objective matches
        Newton's to ~1e-3 (the two metrics differ, so the stalls do)."""
        prob = make_poisson_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        s_n = scso.iterate(scso.ProxNSCORE(solver="dense"), prob, "l1", sm,
                           max_epoch=80, verbose=0)
        s_g = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", cg_tol=1e-12, cg_maxiter=200,
                              ss_type=3),
            prob, "l1", sm, max_epoch=120, verbose=0)
        f = lambda x: float(losses.poisson_f(prob.A, prob.y, jnp.asarray(x))
                            + LAM * np.abs(x).sum())
        assert np.all(np.isfinite(s_g.x))
        assert f(s_g.x) == pytest.approx(f(s_n.x), rel=2e-3)

    def test_glm_fast_path_matches_out_fn_path(self):
        """The single-z GLM path and the generic jvp/vjp out_fn path solve
        the same GGN system."""
        sm = scso.PHuberSmootherL1L2(1.0)
        meth = scso.ProxGGNSCORE(solver="cg", cg_tol=1e-12, cg_maxiter=200)
        kw = dict(max_epoch=25, verbose=0)
        s_glm = scso.iterate(meth, make_poisson_problem(glm=True), "l1",
                             sm, **kw)
        s_out = scso.iterate(meth, make_poisson_problem(glm=False), "l1",
                             sm, **kw)
        np.testing.assert_allclose(s_glm.x, s_out.x, atol=1e-9)

    def test_ggn_dense_dual_runs_via_ad(self):
        """Only out_fn + loss_fn supplied: AD builds J/residual/Q for the
        dense dual branch (the reference's ForwardDiff route)."""
        prob = make_poisson_problem(ad_only=True, glm=False)
        sm = scso.PHuberSmootherL1L2(1.0)
        s = scso.iterate(scso.ProxGGNSCORE(solver="dense_dual", ss_type=3),
                         prob, "l1", sm, max_epoch=400, verbose=0)
        assert np.all(np.isfinite(s.x))
        assert s.pri_res_norm[-1] < 1e-4

    def test_lbfgs_converges(self):
        prob = make_poisson_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        s = scso.iterate(scso.ProxLQNSCORE(m=10), prob, "l1", sm,
                         max_epoch=400, verbose=0)
        s_n = scso.iterate(scso.ProxNSCORE(solver="dense"), prob, "l1", sm,
                           max_epoch=80, verbose=0)
        f = lambda x: float(losses.poisson_f(prob.A, prob.y, jnp.asarray(x))
                            + LAM * np.abs(x).sum())
        # L-BFGS may land marginally BELOW Newton's damped-prox stall
        assert f(s.x) <= f(s_n.x) * (1 + 5e-4)
