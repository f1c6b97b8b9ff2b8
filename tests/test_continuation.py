"""μ/λ continuation (homotopy) solver mode — algorithms/continuation.py.

The reference defines an `update_mu` hook it never calls
(utils/utils.jl:37-39); `iterate_continuation` is its living
counterpart: anneal the smoothing parameter (and/or the penalty) to the
target with warm starts, then finish at the target with the full budget.
Every stage solves the TRUE composite problem, so continuation must land
on the SAME solution as a direct solve — only the trajectory differs.
"""

import numpy as np
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu._src.struct import replace as dc_replace


def _logreg(m=256, n=64, lam=0.05, seed=5):
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.3, n_active=8, seed=seed, dtype=np.float64,
        label01=True)
    return scso.Problem(A, y, x0, losses.logistic01_f, lam,
                        grad_fx=losses.logistic01_grad,
                        out_fn=losses.sigmoid_out,
                        grad_fy=losses.logistic_ggn_residual,
                        hess_fy_diag=losses.logistic_ggn_qdiag,
                        loss_fn=losses.logistic_loss_01,
                        hvp_w=losses.logistic01_hvp_w,
                        ggn_w=losses.logistic_ggn_w,
                        glm=losses.LOGISTIC01_GLM, dtype=np.float64)


METHOD = scso.ProxGGNSCORE(solver="cg", cg_tol=1e-10, cg_maxiter=100)
KW = dict(x_tol=1e-12, f_tol=0.0, max_epoch=150, verbose=0, alpha=1.0)


class TestMuContinuation:
    def test_same_fixed_point_as_direct(self):
        """μ-annealed and direct solves reach the same solution (the
        target stage runs the same program as the direct solve)."""
        prob = _logreg()
        sm = scso.PHuberSmootherL1L2(1.0)
        direct = scso.iterate(METHOD, prob, "l1", sm, **KW)
        cont = scso.iterate_continuation(
            METHOD, prob, "l1", sm, mu_schedule=[100.0, 10.0, 1.0],
            stage_epochs=5, **KW)
        np.testing.assert_allclose(np.asarray(cont.x),
                                   np.asarray(direct.x), atol=1e-8)
        stages = cont.cg_info["stages"]
        assert [s["mu"] for s in stages] == [100.0, 10.0, 1.0]
        assert all(s["epochs"] <= 5 for s in stages[:-1])
        assert cont.epochs == sum(s["epochs"] for s in stages)

    def test_histories_concatenated(self):
        """Stage histories concatenate with boundary duplicates dropped:
        the objective history is one continuous descent curve."""
        prob = _logreg()
        sm = scso.PHuberSmootherL1L2(1.0)
        cont = scso.iterate_continuation(
            METHOD, prob, "l1", sm, mu_schedule=[10.0, 1.0],
            stage_epochs=4, **KW)
        obj = np.asarray(cont.obj)
        # records = epochs + 1 (one per epoch + final), after dropping
        # each of the (n_stages - 1) boundary duplicates
        assert obj.shape[0] == cont.epochs + 1
        assert obj[-1] <= obj[0]

    def test_gap_stop_in_early_stage(self):
        """The f_tol gap test can fire inside a non-final stage — the
        homotopy stops early instead of running the remaining stages."""
        prob = _logreg()
        sm = scso.PHuberSmootherL1L2(1.0)
        # anchor the gap at the true optimum so f_tol can fire
        s = scso.iterate(METHOD, prob, "l1", sm, **KW)
        prob_t = dc_replace(prob, x_star=np.asarray(s.x))
        cont = scso.iterate_continuation(
            METHOD, prob_t, "l1", sm, mu_schedule=[1.0, 0.5, 0.25],
            stage_epochs=100, x_tol=1e-12, f_tol=1e-6, max_epoch=150,
            verbose=0, alpha=1.0)
        # stage 0 already solves at the target-quality μ; later stages
        # must not have run
        assert len(cont.cg_info["stages"]) < 3
        assert float(np.min(np.asarray(cont.objrel))) <= 1e-6 * 1.01

    def test_schedule_validation(self):
        prob = _logreg(m=64, n=16)
        sm = scso.PHuberSmootherL1L2(1.0)
        with pytest.raises(ValueError, match="same length"):
            scso.iterate_continuation(METHOD, prob, "l1", sm,
                                      mu_schedule=[10.0, 1.0],
                                      lam_schedule=[0.1], **KW)
        with pytest.raises(ValueError, match="empty"):
            scso.iterate_continuation(METHOD, prob, "l1", sm,
                                      mu_schedule=[], **KW)


class TestLamContinuation:
    def test_lambda_homotopy_matches_direct(self):
        """λ-path continuation ends at the target penalty's solution."""
        prob = _logreg(lam=0.02)
        sm = scso.PHuberSmootherL1L2(1.0)
        direct = scso.iterate(METHOD, prob, "l1", sm, **KW)
        cont = scso.iterate_continuation(
            METHOD, prob, "l1", sm, lam_schedule=[0.5, 0.1, 0.02],
            stage_epochs=5, **KW)
        np.testing.assert_allclose(np.asarray(cont.x),
                                   np.asarray(direct.x), atol=1e-8)
        assert [s["lam"] for s in cont.cg_info["stages"]] == \
            [[0.5], [0.1], [0.02]] or \
            [s["lam"] for s in cont.cg_info["stages"]] == [0.5, 0.1, 0.02]

    def test_joint_mu_lambda(self):
        prob = _logreg(lam=0.05)
        sm = scso.PHuberSmootherL1L2(1.0)
        direct = scso.iterate(METHOD, prob, "l1", sm, **KW)
        cont = scso.iterate_continuation(
            METHOD, prob, "l1", sm,
            mu_schedule=[10.0, 1.0], lam_schedule=[0.2, 0.05],
            stage_epochs=5, **KW)
        np.testing.assert_allclose(np.asarray(cont.x),
                                   np.asarray(direct.x), atol=1e-8)


class TestContinuationGL:
    def test_group_lasso_two_lambda_schedule(self):
        """'gl' continuation with two-λ vectors per stage (the GL
        regularizer carries [λ1, λ2])."""
        A, y, x_true, x0, groups = synthetic.make_group_lasso_problem(
            64, 32, 8, p_active=0.3, noise_std=0.05, seed=3,
            dtype=np.float64)
        prob = scso.Problem(
            A, y, x0, losses.lsq_f, [1e-8, 0.01],
            grad_fx=losses.lsq_grad, out_fn=losses.linear_out,
            loss_fn=losses.lsq_loss, grad_fy=losses.lsq_ggn_residual,
            hess_fy_diag=losses.lsq_ggn_qdiag, glm=losses.LSQ_GLM,
            sol=x_true, groups=groups, dtype=np.float64)
        sm = scso.PHuberSmootherGL(1e-2, prob)
        direct = scso.iterate(METHOD, prob, "gl", sm, **KW)
        # schedule stays MODERATE on purpose: a first stage sparse
        # enough to zero whole groups LOCKS them at zero (the GL
        # smoother Hessian is exactly 0 there, so the scaled prox
        # threshold t = ss·λ/Hr is infinite — same mechanics as the
        # reference's 1./Hr_diag metric). See the docstring hazard note.
        cont = scso.iterate_continuation(
            METHOD, prob, "gl", sm,
            lam_schedule=[[1e-8, 0.02], [1e-8, 0.01]],
            stage_epochs=8, **KW)
        np.testing.assert_allclose(np.asarray(cont.x),
                                   np.asarray(direct.x), atol=1e-6)

    def test_gl_oversparse_stage_traps_groups(self):
        """Documents the hazard: an over-sparse early λ2 stage zeroes
        groups that can never re-enter (infinite variable-metric prox
        threshold at a zero group — reference parity). The homotopy
        then lands at a WORSE objective than the direct solve."""
        A, y, x_true, x0, groups = synthetic.make_group_lasso_problem(
            64, 32, 8, p_active=0.3, noise_std=0.05, seed=3,
            dtype=np.float64)
        prob = scso.Problem(
            A, y, x0, losses.lsq_f, [1e-8, 0.01],
            grad_fx=losses.lsq_grad, out_fn=losses.linear_out,
            loss_fn=losses.lsq_loss, grad_fy=losses.lsq_ggn_residual,
            hess_fy_diag=losses.lsq_ggn_qdiag, glm=losses.LSQ_GLM,
            sol=x_true, groups=groups, dtype=np.float64)
        sm = scso.PHuberSmootherGL(1e-2, prob)
        direct = scso.iterate(METHOD, prob, "gl", sm, **KW)
        cont = scso.iterate_continuation(
            METHOD, prob, "gl", sm,
            lam_schedule=[[1e-8, 0.1], [1e-8, 0.01]],
            stage_epochs=8, **KW)
        nnz_d = (np.abs(np.asarray(direct.x)) > 1e-10).sum()
        nnz_c = (np.abs(np.asarray(cont.x)) > 1e-10).sum()
        assert nnz_c < nnz_d           # groups stayed trapped at zero
        assert cont.obj[-1] > direct.obj[-1]
