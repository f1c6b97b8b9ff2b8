"""End-to-end solver regression tests.

Oracle fixtures ported verbatim from the reference test suite
(/root/reference/test/test_algs.jl): the 5×2 sparse logistic regression
(all three methods × {l1, l2}, rel/objrel ≤ 1e-6) and the 5×5
box-constrained QP (PHuber & Exponential ind-box smoothers, ≤ 1e-3).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models import losses

# --- logistic fixture (test_algs.jl:2-13) ---------------------------------
A_LOG = np.array([
    [-0.560501, 0.0],
    [0.0, 1.85278],
    [-0.0192918, -0.827763],
    [0.128064, 0.110096],
    [0.0, -0.251176],
])
Y_LOG = np.array([-1.0, -1.0, -1.0, 1.0, -1.0])
X0_LOG = np.array([0.5908446386657102, 0.7667970365022592])
LAM = 1.0
MU = 1.0
TOL = 1e-6


def f_reg(A, y, x):
    return jnp.sum(jnp.log1p(jnp.exp(-y * (A @ x)))) / 5.0


def f_reg_y(y, yhat):
    return -jnp.sum(y * jnp.log(yhat) + (1.0 - y) * jnp.log(1.0 - yhat)) / 5.0


def Mfunc(A, x):
    return 1.0 / (1.0 + jnp.exp(-(A @ x)))


def make_log_problem(**kw):
    return scso.Problem(A_LOG, Y_LOG, X0_LOG, f_reg, LAM, dtype=np.float64, **kw)


def check(sol):
    assert sol.epochs + 1 >= 1
    assert sol.rel[-1] <= TOL
    assert sol.objrel[-1] <= TOL


@pytest.mark.parametrize("reg_name", ["l1", "l2"])
class TestLogisticOracles:
    # parity: "Proximal Newton SCORE l1 l2" (test_algs.jl:15-27)
    def test_prox_newton(self, reg_name):
        model = make_log_problem()
        np.testing.assert_allclose(np.asarray(model.x), np.zeros(2))
        sol = scso.iterate(scso.ProxNSCORE(), model, reg_name,
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        check(sol)

    # parity: "Proximal GGN SCORE l1 l2" (test_algs.jl:29-41)
    def test_prox_ggn(self, reg_name):
        model = make_log_problem(out_fn=Mfunc, loss_fn=f_reg_y)
        sol = scso.iterate(scso.ProxGGNSCORE(), model, reg_name,
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        check(sol)

    # parity: "Proximal L-BFGS SCORE l1 l2" (test_algs.jl:43-55)
    def test_prox_lbfgs(self, reg_name):
        model = make_log_problem()
        sol = scso.iterate(scso.ProxLQNSCORE(), model, reg_name,
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        check(sol)

    def test_ggn_solver_variants_agree(self, reg_name):
        """auto(dual here: q+1=6 > n=2 → primal), forced dual, forced
        primal and matrix-free CG must land on the same solution."""
        sols = []
        for solver in ["auto", "dense_dual", "dense_primal", "cg"]:
            kw = dict(out_fn=Mfunc, loss_fn=f_reg_y)
            if solver == "cg":
                kw.update(
                    grad_fy=losses.logistic_ggn_residual,
                    hess_fy_diag=losses.logistic_ggn_qdiag,
                )
            model = make_log_problem(**kw)
            sol = scso.iterate(
                scso.ProxGGNSCORE(solver=solver, cg_tol=1e-12, cg_maxiter=50),
                model, reg_name, scso.PHuberSmootherL1L2(MU), verbose=0)
            check(sol)
            sols.append(sol.x)
        for s in sols[1:]:
            np.testing.assert_allclose(s, sols[0], atol=1e-6)

    def test_user_derivatives_match_ad(self, reg_name):
        """Closed-form logistic grad/hess (models.losses) vs AD fallback."""
        model_ad = make_log_problem()
        model_user = make_log_problem(
            grad_fx=losses.logistic_grad, hess_fx=losses.logistic_hess
        )
        s1 = scso.iterate(scso.ProxNSCORE(), model_ad, reg_name,
                          scso.PHuberSmootherL1L2(MU), verbose=0)
        s2 = scso.iterate(scso.ProxNSCORE(), model_user, reg_name,
                          scso.PHuberSmootherL1L2(MU), verbose=0)
        np.testing.assert_allclose(s1.x, s2.x, atol=1e-10)

    def test_timed_mode_matches_fused(self, reg_name):
        model = make_log_problem()
        s1 = scso.iterate(scso.ProxLQNSCORE(), model, reg_name,
                          scso.PHuberSmootherL1L2(MU), verbose=0)
        s2 = scso.iterate(scso.ProxLQNSCORE(), model, reg_name,
                          scso.PHuberSmootherL1L2(MU), verbose=0, mode="timed")
        np.testing.assert_allclose(s1.x, s2.x, atol=1e-12)
        assert s1.epochs == s2.epochs
        np.testing.assert_allclose(s1.obj, s2.obj, atol=1e-12)


# --- box QP fixture (test_algs.jl:81-108) ----------------------------------
A_QP = np.array([
    [1.53976, 0.201833, 0.433995, 0.156497, 0.180124],
    [0.201833, 2.37257, -0.0594941, -0.671533, 0.0739676],
    [0.433995, -0.0594941, 3.15025, 0.808797, 0.954656],
    [0.156497, -0.671533, 0.808797, 2.74361, 0.5621],
    [0.180124, 0.0739676, 0.954656, 0.5621, 1.76141],
])
Y_QP = np.array([0.8673472019512456, -0.9017438158568171,
                 -0.4944787535042339, -0.9029142938652416,
                 0.8644013132535154])
X0_QP = np.array([-2.07754990163271, -2.311005948690538,
                  -0.25157276401631606, -0.8858618022602884,
                  1.3116613046047525])
XSTAR_QP = np.array([-0.7139006111210786, 0.642716661564418,
                     0.3684773651494535, 0.5890487798472874,
                     -0.8324174178513779])


def f_qp(A, y, x):
    return 0.5 * jnp.dot(x, A @ x) + jnp.dot(y, x)


class TestBoxQP:
    TOL = 1e-3

    def make(self):
        return scso.Problem(A_QP, Y_QP, X0_QP, f_qp, 1.0e-4,
                            C_set=[-1.0, 1.0], sol=XSTAR_QP,
                            dtype=np.float64)

    # parity: "PHuber indbox" (test_algs.jl:94-99)
    def test_phuber_indbox(self):
        model = self.make()
        sol = scso.iterate(scso.ProxNSCORE(), model, "indbox",
                           scso.PHuberSmootherIndBox(-1.0, 1.0, 0.6),
                           alpha=0.8, verbose=0)
        assert sol.epochs + 1 >= 1
        assert sol.rel[-1] <= self.TOL
        assert sol.objrel[-1] <= self.TOL

    # parity: "Exp indbox" (test_algs.jl:101-107)
    def test_exp_indbox(self):
        model = self.make()
        sol = scso.iterate(scso.ProxNSCORE(), model, "indbox",
                           scso.ExponentialSmootherIndBox(-1.0, 1.0, 0.6),
                           alpha=1.0, verbose=0)
        assert sol.epochs + 1 >= 1
        assert sol.rel[-1] <= self.TOL
        assert sol.objrel[-1] <= self.TOL

    def test_logexp_indbox(self):
        """Untested in the reference (SURVEY.md §4) — covered here."""
        model = self.make()
        sol = scso.iterate(scso.ProxNSCORE(), model, "indbox",
                           scso.LogExpSmootherIndBox(-1.0, 1.0, 0.6),
                           alpha=0.8, verbose=0)
        assert sol.rel[-1] <= 2e-3


class TestRosenbrock:
    # README quick start (README.md:46-67): l1-regularized Rosenbrock via
    # the generic (no-data) problem path
    def test_lbfgs_quickstart(self):
        x0 = np.array([0.2, -0.5])
        problem = scso.Problem(x0, losses.rosenbrock, 1e-8, dtype=np.float64)
        sol = scso.iterate(scso.ProxLQNSCORE(use_prox=True, m=10), problem,
                           "l1", scso.PHuberSmootherL1L2(1.0),
                           max_epoch=2000, verbose=0)
        np.testing.assert_allclose(sol.x, [1.0, 1.0], atol=1e-3)

    def test_newton_generic(self):
        x0 = np.array([0.2, -0.5])
        problem = scso.Problem(x0, losses.rosenbrock, 1e-8, dtype=np.float64)
        sol = scso.iterate(scso.ProxNSCORE(), problem, "l1",
                           scso.PHuberSmootherL1L2(1.0), alpha=1.0,
                           max_epoch=500, verbose=0)
        np.testing.assert_allclose(sol.x, [1.0, 1.0], atol=1e-4)


class TestSolveOptions:
    def test_metrics_fused(self):
        model = make_log_problem()
        metrics = {"xnorm": lambda prob, x: jnp.linalg.norm(x)}
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), metrics=metrics,
                           verbose=0)
        assert "xnorm" in sol.metricvals
        assert len(sol.metricvals["xnorm"]) == len(sol.obj)
        assert sol.metricvals["xnorm"][0] == pytest.approx(
            np.linalg.norm(X0_LOG)
        )

    def test_test_set_history(self):
        model = scso.Problem(A_LOG, Y_LOG, X0_LOG, f_reg, LAM,
                             Atest=A_LOG, ytest=Y_LOG, dtype=np.float64)
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        assert len(sol.fvaltest) == len(sol.fval)
        np.testing.assert_allclose(sol.fvaltest, sol.fval, atol=1e-12)

    def test_histories_monotone_convergence(self):
        model = make_log_problem()
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        assert sol.obj[-1] <= sol.obj[0]
        assert len(sol.obj) == sol.epochs + 1
        assert np.isnan(sol.pri_res_norm[0])  # no step before first record

    def test_max_epoch_cap(self):
        model = make_log_problem()
        sol = scso.iterate(scso.ProxLQNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), max_epoch=3,
                           verbose=0)
        assert sol.epochs <= 3

    def test_ss3_linesearch(self):
        model = make_log_problem()
        sol = scso.iterate(scso.ProxNSCORE(ss_type=3), model, "l1",
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        check(sol)

    def test_ss2_bb(self):
        model = make_log_problem()
        sol = scso.iterate(scso.ProxNSCORE(ss_type=2), model, "l1",
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        assert sol.rel[-1] <= 1e-4  # BB is cruder; still converges

    def test_no_prox_variant(self):
        # without the prox step the iterates settle at the SMOOTHED
        # problem's solution (parity: use_prox=false skips prox and takes
        # only the damped Newton step, prox-N-SCORE.jl:109-111)
        model = make_log_problem()
        sol = scso.iterate(scso.ProxNSCORE(use_prox=False), model, "l2",
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        assert sol.obj[-1] <= sol.obj[0]
        assert sol.rel[-1] <= 0.2

    def test_batched_mode_runs(self):
        # batching paths are untested in the reference (SURVEY.md §4 —
        # its "batch" testsets never pass batch_size); we verify ours
        model = make_log_problem(out_fn=Mfunc, loss_fn=f_reg_y)
        sol = scso.iterate(scso.ProxGGNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), batch_size=1,
                           max_epoch=300, verbose=0)
        assert sol.rel[-1] <= 1e-3

    def test_partial_final_batch(self):
        """A non-divisor batch_size serves a final PARTIAL batch of true
        rows — the reference's MLUtils.DataLoader semantics
        (utils/utils.jl:18-20, consumed at iterate.jl:136-145). m=5,
        bs=2 → per-epoch batches of 2, 2, 1 (static shapes: one extra
        compiled step at the remainder shape)."""
        model = make_log_problem()
        sm = scso.PHuberSmootherL1L2(MU)
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1", sm,
                           batch_size=2, max_epoch=300, verbose=0)
        assert sol.rel[-1] <= 1e-3
        # fused and timed modes take the SAME batch sequence when
        # shuffling is off — trajectories must agree exactly
        kw = dict(batch_size=2, shuffle_batch=False, max_epoch=20,
                  x_tol=0.0, f_tol=0.0, verbose=0)
        s_f = scso.iterate(scso.ProxNSCORE(), model, "l1", sm,
                           mode="fused", **kw)
        s_t = scso.iterate(scso.ProxNSCORE(), model, "l1", sm,
                           mode="timed", **kw)
        np.testing.assert_allclose(np.asarray(s_f.x), np.asarray(s_t.x),
                                   rtol=1e-12, atol=1e-14)

    def test_partial_batch_m100_bs32(self):
        """The exact reference-portability scenario: batch_size=32 with
        m=100 runs (the reference DataLoader serves 32,32,32,4) and the
        mini-batch solve lands near the full-batch solution."""
        from scso_tpu.models import synthetic

        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            100, 20, density=0.3, n_active=5, seed=5, dtype=np.float64,
            label01=True)
        prob = scso.Problem(A, y, x0, losses.logistic01_f, 0.05,
                            grad_fx=losses.logistic01_grad,
                            glm=losses.LOGISTIC01_GLM,
                            dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(MU)
        full = scso.iterate(scso.ProxNSCORE(solver="cg"), prob, "l1", sm,
                            max_epoch=200, verbose=0)
        mb = scso.iterate(scso.ProxNSCORE(solver="cg"), prob, "l1", sm,
                          batch_size=32, max_epoch=400, verbose=0,
                          rng_seed=3)
        assert np.all(np.isfinite(mb.x))
        # mini-batch steps have an SGD-like noise floor; 5% of the
        # full-batch objective is the sanity band, not an oracle
        assert abs(mb.obj[-1] - full.obj[-1]) <= 5e-2 * abs(full.obj[-1])

    def test_local_max_iter_truncates_remainder(self):
        """local_max_iter counts the remainder batch as a list entry
        (reference get_loader_subset semantics, iterate.jl:145)."""
        from scso_tpu.algorithms.iterate import Options, _make_batches

        model = make_log_problem()
        # m=5, bs=2 → (2 full, rem 1); cap at 2 drops the remainder
        opts = Options(batch_size=2, local_max_iter=2)
        assert _make_batches(model, opts, 2) == (2, 2, 1)[:2] + (0,)
        # cap beyond the full batches keeps the remainder
        opts = Options(batch_size=2, local_max_iter=5)
        assert _make_batches(model, opts, 2) == (2, 2, 1)
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), batch_size=2,
                           local_max_iter=2, verbose=0)
        assert sol.epochs == 1

    def test_local_max_iter(self):
        model = make_log_problem()
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), batch_size=1,
                           local_max_iter=2, verbose=0)
        # one epoch, at most 2 inner steps
        assert sol.epochs == 1


class TestStatsEvery:
    def test_stats_every_preserves_solution(self):
        model = make_log_problem()
        s1 = scso.iterate(scso.ProxNSCORE(), model, "l1",
                          scso.PHuberSmootherL1L2(MU), verbose=0)
        s4 = scso.iterate(scso.ProxNSCORE(), model, "l1",
                          scso.PHuberSmootherL1L2(MU), verbose=0,
                          stats_every=4)
        # same trajectory; stopping may lag by < stats_every epochs
        np.testing.assert_allclose(s4.x, s1.x, atol=1e-9)
        assert abs(s4.epochs - s1.epochs) < 4
        # history is sparser but endpoints agree
        assert len(s4.obj) < len(s1.obj)
        np.testing.assert_allclose(s4.obj[-1], s1.obj[-1], atol=1e-12)

    def test_vmap_safe_inner_matches_cond_inner(self):
        """The where-masked inner loop (vmap_safe=True, used by sweeps)
        must be step-for-step identical to the lax.cond inner."""
        model = make_log_problem()
        cond = scso.iterate(scso.ProxNSCORE(), model, "l1",
                            scso.PHuberSmootherL1L2(MU), verbose=0,
                            stats_every=4)
        masked = scso.iterate(scso.ProxNSCORE(), model, "l1",
                              scso.PHuberSmootherL1L2(MU), verbose=0,
                              stats_every=4, vmap_safe=True)
        # same steps; XLA may fuse the two programs differently → allow
        # roundoff-level drift, nothing more
        np.testing.assert_allclose(np.asarray(masked.x),
                                   np.asarray(cond.x), atol=1e-12)
        assert masked.epochs == cond.epochs


class TestBatchingSemantics:
    def test_slice_samples_forces_bs1(self):
        """slice_samples=True iterates single samples (iterate.jl:139-141);
        untested in the reference (its 'slice_samples' testset never
        passes the kwarg — SURVEY.md §4)."""
        model = make_log_problem()
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), slice_samples=True,
                           max_epoch=100, verbose=0)
        assert sol.rel[-1] <= 1e-2

    def test_shuffle_determinism(self):
        """Same rng_seed ⇒ identical batched trajectories."""
        model = make_log_problem()
        kw = dict(batch_size=1, max_epoch=20, verbose=0)
        s1 = scso.iterate(scso.ProxLQNSCORE(), model, "l1",
                          scso.PHuberSmootherL1L2(MU), rng_seed=3, **kw)
        s2 = scso.iterate(scso.ProxLQNSCORE(), model, "l1",
                          scso.PHuberSmootherL1L2(MU), rng_seed=3, **kw)
        np.testing.assert_array_equal(s1.x, s2.x)
        np.testing.assert_array_equal(s1.obj, s2.obj)

    def test_no_shuffle_batches(self):
        model = make_log_problem()
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), batch_size=1,
                           shuffle_batch=False, max_epoch=100, verbose=0)
        assert sol.rel[-1] <= 1e-2


class TestSizeAwareAuto:
    """solver='auto' picks matrix-free CG above the dense budgets —
    parity anchor: the reference itself picks the cheaper dense system
    (prox-GGN-SCORE.jl:124-131); on TPU the cheaper system above the
    budget is matrix-free CG."""

    def test_newton_auto_small_is_dense(self):
        from scso_tpu.algorithms.steps import _resolve_newton_solver
        x = jnp.zeros((50,))
        assert _resolve_newton_solver(scso.ProxNSCORE(), x) == "dense"
        assert _resolve_newton_solver(
            scso.ProxNSCORE(solver="cg"), x) == "cg"

    def test_newton_auto_large_is_cg(self):
        from scso_tpu.algorithms.steps import (
            _DENSE_NEWTON_MAX_N, _resolve_newton_solver)
        x = jnp.zeros((_DENSE_NEWTON_MAX_N + 1,))
        with pytest.warns(UserWarning, match="Newton-CG"):
            assert _resolve_newton_solver(scso.ProxNSCORE(), x) == "cg"
        # forced dense is honored regardless of size
        assert _resolve_newton_solver(
            scso.ProxNSCORE(solver="dense"), x) == "dense"

    def test_ggn_auto_large_is_cg(self):
        from scso_tpu.algorithms.steps import _resolve_ggn_solver
        from scso_tpu.models import losses

        m, n = 4200, 4100  # m·n > 2^24
        x0 = np.zeros((n,), np.float32)
        prob = scso.Problem(np.zeros((m, n), np.float32),
                            np.zeros((m,), np.float32), x0,
                            losses.logistic01_f, 1e-2,
                            glm=losses.LOGISTIC01_GLM)
        with pytest.warns(UserWarning, match="GGN-CG"):
            got = _resolve_ggn_solver(scso.ProxGGNSCORE(), prob, prob.A,
                                      jnp.asarray(x0))
        assert got == "cg"

    def test_ggn_auto_without_matrix_free_pieces_stays_dense(self):
        """No glm/out_fn → CG cannot run; auto must keep the dense branch
        (the user gets the reference behavior, not a crash)."""
        from scso_tpu.algorithms.steps import _resolve_ggn_solver
        prob = make_log_problem()
        big_A = jnp.zeros((5000, 5000))
        assert _resolve_ggn_solver(scso.ProxGGNSCORE(), prob, big_A,
                                   jnp.zeros((5000,))) == "auto"

    def test_newton_auto_cg_matches_dense_solution(self):
        """End-to-end: above-budget auto (→ CG, tight tol) lands on the
        dense solution."""
        from scso_tpu.models import losses, synthetic

        m, n = 256, 2080  # n just over the dense budget
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            m, n, density=0.05, n_active=8, seed=1, dtype=np.float64,
            label01=True)
        prob = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                            grad_fx=losses.logistic01_grad,
                            hess_fx=losses.logistic01_hess,
                            glm=losses.LOGISTIC01_GLM, dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(1.0)
        with pytest.warns(UserWarning, match="Newton-CG"):
            s_auto = scso.iterate(
                scso.ProxNSCORE(cg_tol=1e-12, cg_adaptive=False), prob,
                "l1", sm, max_epoch=30, verbose=0)
        s_dense = scso.iterate(scso.ProxNSCORE(solver="dense"), prob, "l1",
                               sm, max_epoch=30, verbose=0)
        np.testing.assert_allclose(s_auto.x, s_dense.x, atol=1e-8)


class TestTimedModeBatching:
    def test_timed_batched_matches_fused_no_shuffle(self):
        """Timed mode supports mini-batching with the same static-shape
        semantics as fused mode; with shuffle off the trajectories are
        identical (shuffle permutations come from different RNGs)."""
        model = make_log_problem()
        kw = dict(batch_size=1, shuffle_batch=False, max_epoch=30,
                  verbose=0)
        s_f = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), **kw)
        s_t = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), mode="timed", **kw)
        np.testing.assert_allclose(s_t.x, s_f.x, atol=1e-12)
        assert s_t.epochs == s_f.epochs

    def test_timed_batched_shuffled_converges(self):
        model = make_log_problem()
        sol = scso.iterate(scso.ProxLQNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), batch_size=1,
                           max_epoch=100, verbose=0, mode="timed")
        assert sol.rel[-1] <= 1e-2
        assert len(sol.times) == len(sol.obj)

    def test_timed_zero_max_epoch(self):
        """Regression: epoch loop never running left `conv` unbound."""
        model = make_log_problem()
        sol = scso.iterate(scso.ProxNSCORE(), model, "l1",
                           scso.PHuberSmootherL1L2(MU), max_epoch=0,
                           verbose=2, mode="timed")
        assert sol.epochs == 0

    def test_timed_verbose3_ticks(self, capsys):
        model = make_log_problem()
        scso.iterate(scso.ProxNSCORE(), model, "l1",
                     scso.PHuberSmootherL1L2(MU), batch_size=1,
                     max_epoch=2, verbose=3, mode="timed")
        out = capsys.readouterr().out
        assert "[1/5]" in out  # per-batch progress — iterate.jl:212-218


class TestIntervalCSet:
    """Interval-set C_set forms — parity: IntervalVectorTupleOrNothing
    (types/custom.jl:26-27) and the interval unpacking in prox/get_reg
    (prox-operators.jl:33-43, regularizers.jl:10-18)."""

    def test_scalar_interval_matches_array_form(self):
        model_arr = scso.Problem(A_QP, Y_QP, X0_QP, f_qp, 1.0e-4,
                                 C_set=[-1.0, 1.0], sol=XSTAR_QP,
                                 dtype=np.float64)
        model_int = scso.Problem(A_QP, Y_QP, X0_QP, f_qp, 1.0e-4,
                                 C_set=scso.Interval(-1.0, 1.0),
                                 sol=XSTAR_QP, dtype=np.float64)
        sm = scso.PHuberSmootherIndBox(-1.0, 1.0, 0.6)
        s_a = scso.iterate(scso.ProxNSCORE(), model_arr, "indbox", sm,
                           alpha=0.8, verbose=0)
        s_i = scso.iterate(scso.ProxNSCORE(), model_int, "indbox", sm,
                           alpha=0.8, verbose=0)
        np.testing.assert_array_equal(s_i.x, s_a.x)

    def test_per_coordinate_intervals(self):
        ivals = tuple(scso.Interval(-1.0, 1.0) for _ in range(5))
        model = scso.Problem(A_QP, Y_QP, X0_QP, f_qp, 1.0e-4,
                             C_set=ivals, sol=XSTAR_QP, dtype=np.float64)
        np.testing.assert_array_equal(np.asarray(model.lb), -np.ones(5))
        np.testing.assert_array_equal(np.asarray(model.ub), np.ones(5))
        sol = scso.iterate(scso.ProxNSCORE(), model, "indbox",
                           scso.PHuberSmootherIndBox(model.lb, model.ub, 0.6),
                           alpha=0.8, verbose=0)
        assert sol.rel[-1] <= 1e-3

    def test_reversed_interval_normalized(self):
        p = scso.Problem(np.zeros(3), losses.rosenbrock, 0.1,
                         C_set=scso.Interval(2.0, -2.0), dtype=np.float64)
        assert float(p.lb) == -2.0 and float(p.ub) == 2.0

    def test_is_interval_set(self):
        assert scso.is_interval_set(scso.Interval(0, 1))
        assert scso.is_interval_set((scso.Interval(0, 1),) * 3)
        assert not scso.is_interval_set([-1.0, 1.0])
        assert not scso.is_interval_set(None)

    def test_empty_problem_ctor(self):
        """Problem() → ProblemLike — parity: problems.jl:42."""
        p = scso.Problem()
        assert isinstance(p, scso.ProblemLike)


class TestAdaptiveForcing:
    """Eisenstat-Walker adaptive CG forcing (cg_adaptive=True): same
    solution at the tolerance, fewer total CG iterations than the fixed
    tight default."""

    def _prob(self):
        from scso_tpu.models import synthetic as syn
        A, y, x0, _ = syn.make_sparse_logreg_data(
            512, 128, density=0.1, n_active=16, seed=9, dtype=np.float64,
            label01=True)
        return scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                            grad_fx=losses.logistic01_grad,
                            glm=losses.LOGISTIC01_GLM, dtype=np.float64)

    @pytest.mark.parametrize("make_method", [
        lambda **kw: scso.ProxGGNSCORE(solver="cg", **kw),
        lambda **kw: scso.ProxNSCORE(solver="cg", **kw),
    ])
    def test_adaptive_matches_fixed_with_fewer_cg_iters(self, make_method):
        prob = self._prob()
        sm = scso.PHuberSmootherL1L2(1.0)
        kw = dict(max_epoch=200, f_tol=1e-9, verbose=0, alpha=1.0)
        # greedy off on both sides: this test isolates the CG FORCING
        # comparison (fixed vs Eisenstat-Walker) on the damped iteration
        fixed = scso.iterate(
            make_method(cg_adaptive=False, greedy_alpha=False), prob,
            "l1", sm, **kw)
        adapt = scso.iterate(
            make_method(cg_adaptive=True, greedy_alpha=False), prob,
            "l1", sm, **kw)
        np.testing.assert_allclose(adapt.obj[-1], fixed.obj[-1], rtol=1e-7)
        np.testing.assert_allclose(adapt.x, fixed.x, atol=1e-5)
        assert (adapt.cg_info["total_cg_iters"]
                < fixed.cg_info["total_cg_iters"])
        # adaptive must not blow up the outer iteration count
        assert adapt.epochs <= 2 * fixed.epochs + 5
