"""Epoch-fused greedy path (steps.GLMCache + fused_glm_prep_pair).

The round-4 perf centerpiece: one dual-candidate A-pass per epoch serves
as the greedy trial objective, the damped candidate's objective, the
NEXT epoch's CG prep (RHS pullback + matvec weights + Jacobi diagonal)
and the stats fval — replacing ~3 separate passes of the round-3 path.
These tests pin (a) the pair kernel against its jnp reference, (b) the
loss_sample/loss_z contract on every spec that declares both, (c)
trajectory equality of the cached path vs the round-3 uncached greedy
path, (d) stats-history correctness (the cached fval IS f at the
recorded iterates), and (e) resume/continuation interactions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.algorithms.steps import (
    GLMCache, epoch_cache_enabled, prime_glm_cache, _glm_kernel_fns,
    _loss_scale)
from scso_tpu.ops.pallas.glm_prep import (
    _fused_glm_prep_pair, fused_glm_prep_pair)
from scso_tpu._src.struct import replace as dc_replace


def _logreg_problem(m=512, n=128, seed=3, lam=0.01):
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.2, n_active=16, seed=seed, dtype=np.float64,
        label01=True)
    return scso.Problem(
        A, y, x0, losses.logistic01_f, lam,
        grad_fx=losses.logistic01_grad,
        hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM, dtype=np.float64)


SOLVE_KW = dict(max_epoch=60, f_tol=1e-12, x_tol=1e-12, verbose=0,
                alpha=1.0)


class TestPairKernel:
    @pytest.mark.parametrize("m,n", [(500, 128), (64, 256), (1024, 128)])
    def test_matches_jnp_reference(self, m, n):
        """Interpret-mode kernel vs per-column pullbacks — incl. a
        non-divisor m (the padded rows must not leak into the loss)."""
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.standard_normal((m, n)) * 0.1)
        y = jnp.asarray((rng.random(m) > 0.5).astype(np.float64))
        xt = jnp.asarray(rng.standard_normal(n) * 0.01)
        xd = jnp.asarray(rng.standard_normal(n) * 0.01)
        g = losses.LOGISTIC01_GLM
        rw_fn, w_fn, loss_fn = _glm_kernel_fns(g, m)
        pp = _fused_glm_prep_pair(A, y, xt, xd, rw_fn, w_fn, loss_fn,
                                  interpret=True)

        def ref(x):
            z = A @ x
            w = w_fn(y, z)
            return (w, A.T @ rw_fn(y, z),
                    jnp.einsum("i,ij,ij->j", w, A, A),
                    jnp.sum(loss_fn(y, z)))

        for got, want in zip(
                (pp.w_t, pp.b_t, pp.hd_t, pp.loss_t), ref(xt)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-10, atol=1e-12)
        for got, want in zip(
                (pp.w_d, pp.b_d, pp.hd_d, pp.loss_d), ref(xd)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-10, atol=1e-12)

    def test_fallback_matches_on_unsupported_shape(self):
        """n % 128 != 0 → the jnp fallback, same PairPrep contract."""
        rng = np.random.default_rng(1)
        m, n = 200, 100
        A = jnp.asarray(rng.standard_normal((m, n)) * 0.1)
        y = jnp.asarray(rng.standard_normal(m))
        xt = jnp.asarray(rng.standard_normal(n) * 0.1)
        xd = jnp.asarray(rng.standard_normal(n) * 0.1)
        g = losses.LSQ_GLM
        rw_fn, w_fn, loss_fn = _glm_kernel_fns(g, m)
        pp = fused_glm_prep_pair(A, y, xt, xd, rw_fn, w_fn, loss_fn)
        z = A @ xt
        np.testing.assert_allclose(np.asarray(pp.b_t),
                                   np.asarray(A.T @ rw_fn(y, z)))
        np.testing.assert_allclose(float(pp.loss_t),
                                   float(jnp.sum(loss_fn(y, z))))


class TestLossSampleContract:
    @pytest.mark.parametrize("spec,ymaker", [
        (losses.LOGISTIC01_GLM,
         lambda rng, m: (rng.random(m) > 0.5).astype(np.float64)),
        (losses.LSQ_GLM, lambda rng, m: rng.standard_normal(m)),
        (losses.POISSON_GLM,
         lambda rng, m: rng.poisson(2.0, m).astype(np.float64)),
    ])
    def test_loss_sample_sums_to_loss_z(self, spec, ymaker):
        rng = np.random.default_rng(7)
        m = 257
        y = jnp.asarray(ymaker(rng, m))
        z = jnp.asarray(rng.standard_normal(m) * 0.5)
        assert spec.loss_sample is not None and spec.loss_z is not None
        total = jnp.sum(spec.loss_sample(y, z)) * _loss_scale(spec, m)
        np.testing.assert_allclose(float(total), float(spec.loss_z(y, z)),
                                   rtol=1e-12)


class TestCachedSolve:
    def test_enabled_predicate(self):
        prob = _logreg_problem()
        on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True)
        assert epoch_cache_enabled(on, prob, "l1", True)
        # every gate, individually
        assert not epoch_cache_enabled(on, prob, "l1", False)  # batched
        assert not epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                              epoch_cache=False), prob, "l1", True)
        assert not epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True, ss_type=2),
            prob, "l1", True)
        # greedy OFF caches too (damped-path re-prime; round 4)
        assert epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=False),
            prob, "l1", True)
        assert not epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                              curvature_rows=64), prob, "l1", True)
        # static_precond only gates the cache when it ACTS (col_sumsq
        # attached); as a no-op flag the cache stays on
        assert not epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                              static_precond=True),
            scso.with_col_sumsq(prob), "l1", True)
        assert epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                              static_precond=True), prob, "l1", True)
        assert not epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="dense_primal", greedy_alpha=True),
            prob, "l1", True)
        # no loss_sample on the spec → off
        g2 = prob.glm._replace(loss_sample=None)
        from scso_tpu._src.struct import replace as _rep
        assert not epoch_cache_enabled(on, _rep(prob, glm=g2), "l1", True)
        # AUTO greedy resolves off below n = 4096 — the cache stays ON
        # via the damped-path re-prime (round 4)
        assert epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="cg"), prob, "l1", True)
        # an ACTING cg_lp_tol keeps the cache ON (round 4: the cached
        # path routes curvature matvecs through A_lp itself)
        assert epoch_cache_enabled(
            scso.ProxGGNSCORE(solver="cg", cg_adaptive=True,
                              cg_lp_tol=1e-2),
            scso.with_lp_copy(prob), "l1", True)

    @pytest.mark.parametrize("kernels", ["xla", "pallas"])
    def test_trajectory_matches_uncached(self, kernels):
        """Cached and round-3 uncached greedy paths compute the same
        mathematics — objective histories agree to f64 roundoff."""
        prob = _logreg_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                                 kernels=kernels)
        m_off = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                                  kernels=kernels, epoch_cache=False)
        s_on = scso.iterate(m_on, prob, "l1", sm, **SOLVE_KW)
        s_off = scso.iterate(m_off, prob, "l1", sm, **SOLVE_KW)
        assert s_on.epochs == s_off.epochs
        np.testing.assert_allclose(s_on.obj, s_off.obj, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s_on.x),
                                   np.asarray(s_off.x), atol=1e-12)

    @pytest.mark.parametrize("kernels", ["xla", "pallas"])
    def test_damped_cached_matches_uncached(self, kernels):
        """Greedy OFF also caches (round 4: _damped_update_cached — the
        damped step + one re-prime pass). Trajectories must equal the
        uncached damped path to f64 roundoff."""
        prob = _logreg_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=False,
                                 kernels=kernels)
        m_off = scso.ProxGGNSCORE(solver="cg", greedy_alpha=False,
                                  kernels=kernels, epoch_cache=False)
        assert epoch_cache_enabled(m_on, prob, "l1", True)
        s_on = scso.iterate(m_on, prob, "l1", sm, **SOLVE_KW)
        s_off = scso.iterate(m_off, prob, "l1", sm, **SOLVE_KW)
        assert s_on.epochs == s_off.epochs
        np.testing.assert_allclose(s_on.obj, s_off.obj, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(s_on.x),
                                   np.asarray(s_off.x), atol=1e-9)

    def test_cached_ftol_stop_is_per_epoch_exact(self):
        """With the cache, the f_tol test between stats rounds uses the
        EXACT current gap (iterate.gap_now), not the stale round-start
        gap — so a stats_every=4 solve stops at the same epoch as a
        stats_every=1 solve instead of overshooting by up to 3 epochs
        (or, when the endgame oscillates around the threshold, missing
        the dips entirely — the 180-epoch north-star stall)."""
        prob = _logreg_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        m = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True)
        # target a mid-trajectory gap so the stop fires off-grid:
        # presolve for x_star, then a fat f_tol
        pre = scso.iterate(m, prob, "l1", sm, **SOLVE_KW)
        prob_t = dc_replace(prob, x_star=jnp.asarray(pre.state.x))
        kw = dict(max_epoch=60, f_tol=1e-5, x_tol=1e-14, verbose=0,
                  alpha=1.0)
        s1 = scso.iterate(m, prob_t, "l1", sm, stats_every=1, **kw)
        s4 = scso.iterate(m, prob_t, "l1", sm, stats_every=4, **kw)
        assert s4.epochs == s1.epochs
        assert float(s4.objrel[-1]) <= 1e-5

    @pytest.mark.parametrize("kernels", ["xla", "pallas"])
    def test_newton_flavor_matches_uncached(self, kernels):
        """ProxNSCORE + glm also routes through the cache (newton
        flavor: gres/hvp_w true-Hessian weights). λ=0.1: the λ=0.01
        fixture diverges under full-step Newton (a known fuzz-suite
        finding, reference parity) and chaotic trajectories amplify
        ulp-level path differences."""
        prob = _logreg_problem(lam=0.1)
        sm = scso.PHuberSmootherL1L2(1.0)
        m_on = scso.ProxNSCORE(solver="cg", greedy_alpha=True,
                               kernels=kernels)
        m_off = scso.ProxNSCORE(solver="cg", greedy_alpha=True,
                                kernels=kernels, epoch_cache=False)
        assert epoch_cache_enabled(m_on, prob, "l1", True)
        s_on = scso.iterate(m_on, prob, "l1", sm, **SOLVE_KW)
        s_off = scso.iterate(m_off, prob, "l1", sm, **SOLVE_KW)
        assert s_on.epochs == s_off.epochs
        np.testing.assert_allclose(s_on.obj, s_off.obj, rtol=1e-12)

    def test_stats_fval_is_true_objective(self):
        """The cached fval written into the history must equal
        prob.f_val evaluated at the recorded iterates — recompute the
        final one from scratch."""
        prob = _logreg_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True)
        s = scso.iterate(m_on, prob, "l1", sm, **SOLVE_KW)
        f_final = float(prob.f_val(prob.A, prob.y, jnp.asarray(s.x)))
        np.testing.assert_allclose(float(s.fval[-1]), f_final, rtol=1e-12)

    def test_stats_every_histories_match(self):
        """stats_every > 1 with the cache: records land on the same
        epochs with the same values as the uncached path."""
        prob = _logreg_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        kw = {**SOLVE_KW, "stats_every": 4}
        s_on = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True),
            prob, "l1", sm, **kw)
        s_off = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                              epoch_cache=False), prob, "l1", sm, **kw)
        np.testing.assert_allclose(s_on.obj, s_off.obj, rtol=1e-12)

    def test_resume_bitmatch(self):
        """Interrupt + resume through Solution.state (cache included in
        the carry) bit-matches the uninterrupted run."""
        prob = _logreg_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True)
        full = scso.iterate(m_on, prob, "l1", sm, **SOLVE_KW)
        part = scso.iterate(m_on, prob, "l1", sm,
                            **{**SOLVE_KW, "max_epoch": 13})
        res = scso.iterate(m_on, prob, "l1", sm,
                           resume_state=part.state, **SOLVE_KW)
        assert np.array_equal(np.asarray(full.x), np.asarray(res.x))
        np.testing.assert_array_equal(full.obj, res.obj)

    def test_resume_from_uncached_state_reprimes(self):
        """A state saved by an epoch_cache=False solve resumes into a
        cached solve (the driver re-primes) and reaches the same fixed
        point as the fully-uncached continuation."""
        prob = _logreg_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        m_off = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                                  epoch_cache=False)
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True)
        part = scso.iterate(m_off, prob, "l1", sm,
                            **{**SOLVE_KW, "max_epoch": 13})
        res_on = scso.iterate(m_on, prob, "l1", sm,
                              resume_state=part.state, **SOLVE_KW)
        res_off = scso.iterate(m_off, prob, "l1", sm,
                               resume_state=part.state, **SOLVE_KW)
        np.testing.assert_allclose(np.asarray(res_on.x),
                                   np.asarray(res_off.x), atol=1e-12)

    def test_prime_matches_direct_computation(self):
        prob = _logreg_problem()
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                                 kernels="xla")
        fc = prime_glm_cache(m_on, prob, prob.x0)
        assert isinstance(fc, GLMCache)
        z = prob.A @ prob.x0
        g = prob.glm
        np.testing.assert_allclose(
            float(fc.loss), float(g.loss_z(prob.y, z)), rtol=1e-12)
        rw_fn, w_fn, _ = _glm_kernel_fns(g, prob.A.shape[0])
        np.testing.assert_allclose(np.asarray(fc.b_raw),
                                   np.asarray(prob.A.T @ rw_fn(prob.y, z)),
                                   rtol=1e-12)

    def test_gl_regularizer_cached(self):
        """The cache is reg-agnostic — a grouped (gl) problem with the
        LSQ spec runs the cached path and matches uncached."""
        m, n, gsz = 256, 64, 8
        A, y, x_true, x0, groups = synthetic.make_group_lasso_problem(
            m, n, gsz, p_active=0.3, noise_std=0.1, seed=5,
            dtype=np.float64)
        prob = scso.Problem(
            A, y, x0, losses.lsq_f, [1e-8, 0.05],
            grad_fx=losses.lsq_grad, glm=losses.LSQ_GLM,
            groups=groups, dtype=np.float64)
        sm = scso.PHuberSmootherGL(1e-2, prob)
        kw = dict(max_epoch=40, f_tol=1e-12, x_tol=1e-12, verbose=0,
                  alpha=1.0)
        s_on = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True),
            prob, "gl", sm, **kw)
        s_off = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                              epoch_cache=False), prob, "gl", sm, **kw)
        np.testing.assert_allclose(s_on.obj, s_off.obj, rtol=1e-10)

    def test_moglm_cached_matches_uncached(self):
        """Multi-output (multinomial) problems route through MOGLMCache:
        same trajectories as the round-3 uncached greedy mglm path."""
        from scso_tpu.models.losses import (multinom_f, multinom_grad,
                                            multinom_mglm)
        from scso_tpu.models.synthetic import make_multinomial_data

        m, p, k = 512, 32, 4
        A, y, x0, _ = make_multinomial_data(m, p, k, seed=11,
                                            dtype=np.float64)
        prob = scso.Problem(A, y, x0, multinom_f, 1e-3,
                            grad_fx=multinom_grad, mglm=multinom_mglm(k),
                            dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(1.0)
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True)
        m_off = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                                  epoch_cache=False)
        assert epoch_cache_enabled(m_on, prob, "l1", True)
        s_on = scso.iterate(m_on, prob, "l1", sm, **SOLVE_KW)
        s_off = scso.iterate(m_off, prob, "l1", sm, **SOLVE_KW)
        assert s_on.epochs == s_off.epochs
        # 1e-9: the batched (p×2k) pair matmuls reduce in a different
        # order than the per-candidate ones — ulp-level drift only
        np.testing.assert_allclose(s_on.obj, s_off.obj, rtol=1e-9)
        # the cached fval is the true objective at the final iterate
        f_final = float(prob.f_val(prob.A, prob.y,
                                   jnp.asarray(s_on.x)))
        np.testing.assert_allclose(float(s_on.fval[-1]), f_final,
                                   rtol=1e-12)

    def test_moglm_loss_sample_contract(self):
        from scso_tpu.models.losses import multinom_mglm

        rng = np.random.default_rng(2)
        m, k = 129, 5
        g = multinom_mglm(k)
        Z = jnp.asarray(rng.standard_normal((m, k)))
        lab = rng.integers(0, k, m)
        y = jnp.asarray(np.eye(k)[lab])
        total = jnp.sum(g.loss_sample(y, Z)) / m
        np.testing.assert_allclose(float(total), float(g.loss_z(y, Z)),
                                   rtol=1e-12)

    def test_moglm_resume_bitmatch(self):
        from scso_tpu.models.losses import (multinom_f, multinom_grad,
                                            multinom_mglm)
        from scso_tpu.models.synthetic import make_multinomial_data

        m, p, k = 512, 32, 4
        A, y, x0, _ = make_multinomial_data(m, p, k, seed=5,
                                            dtype=np.float64)
        prob = scso.Problem(A, y, x0, multinom_f, 1e-3,
                            grad_fx=multinom_grad, mglm=multinom_mglm(k),
                            dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(1.0)
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True)
        full = scso.iterate(m_on, prob, "l1", sm, **SOLVE_KW)
        part = scso.iterate(m_on, prob, "l1", sm,
                            **{**SOLVE_KW, "max_epoch": 9})
        res = scso.iterate(m_on, prob, "l1", sm,
                           resume_state=part.state, **SOLVE_KW)
        assert np.array_equal(np.asarray(full.x), np.asarray(res.x))

    def test_sharded_cache_matches_unsharded(self):
        """Row-sharded (mesh) problems keep the epoch cache: the pair
        prep runs as GSPMD-partitioned matmuls. The sharded cached solve
        must match the single-device cached solve to f64 roundoff."""
        from scso_tpu.parallel import make_mesh, shard_problem

        prob = _logreg_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        m_on = scso.ProxGGNSCORE(solver="cg", greedy_alpha=True)
        assert epoch_cache_enabled(m_on, shard_problem(prob, make_mesh()),
                                   "l1", True)
        s_single = scso.iterate(m_on, prob, "l1", sm, **SOLVE_KW)
        s_shard = scso.iterate(m_on, shard_problem(prob, make_mesh()),
                               "l1", sm, **SOLVE_KW)
        np.testing.assert_allclose(np.asarray(s_shard.x),
                                   np.asarray(s_single.x), atol=1e-10)
        np.testing.assert_allclose(s_shard.obj, s_single.obj, rtol=1e-10)

    def test_continuation_restages_cleanly(self):
        """λ-continuation chains fresh solves via x0 — each stage primes
        its own cache; the chained result matches the uncached chain."""
        from scso_tpu.algorithms.continuation import iterate_continuation

        prob = _logreg_problem(lam=0.01)
        sm = scso.PHuberSmootherL1L2(1.0)
        kw = dict(stage_epochs=6, max_epoch=40, f_tol=1e-12, x_tol=1e-12,
                  verbose=0, alpha=1.0)
        s_on = iterate_continuation(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True),
            prob, "l1", sm, lam_schedule=[0.05, 0.01], **kw)
        s_off = iterate_continuation(
            scso.ProxGGNSCORE(solver="cg", greedy_alpha=True,
                              epoch_cache=False),
            prob, "l1", sm, lam_schedule=[0.05, 0.01], **kw)
        np.testing.assert_allclose(float(s_on.obj[-1]),
                                   float(s_off.obj[-1]), rtol=1e-10)


class TestEndgameForcing:
    """steps._forcing_tol(endgame=True): the tightening-only mode that
    removes the fixed-forcing inexact fixed point (the round-4 f32
    endgame fix — see docs/DESIGN.md §3e)."""

    def _tol(self, dtype, dxn, ref, it=5, cg_tol=0.0):
        from scso_tpu.algorithms.steps import _forcing_tol

        m = scso.ProxGGNSCORE(solver="cg", cg_tol=cg_tol)
        x = jnp.zeros(4, dtype)
        xp = x.at[0].set(dxn)
        t, r = _forcing_tol(m, jnp.ones(4, dtype), x, xp,
                            jnp.asarray(ref, dtype), jnp.int32(it),
                            endgame=True)
        return float(t), float(r)

    def test_bulk_phase_keeps_the_knee(self):
        # big steps (ratio >= 1): the measured 3e-4 f32 floor, untouched
        t, _ = self._tol(np.float32, dxn=1.0, ref=1.0)
        assert t == pytest.approx(3e-4)

    def test_tightens_superlinearly_with_step_length(self):
        t1, _ = self._tol(np.float32, dxn=1e-2, ref=1.0)
        t2, _ = self._tol(np.float32, dxn=1e-3, ref=1.0)
        assert t1 == pytest.approx(0.9e-4, rel=1e-5)
        assert t2 == pytest.approx(0.9e-6, rel=1e-5)
        # never below 4*eps (CG in f32 cannot resolve residuals there)
        t3, _ = self._tol(np.float32, dxn=1e-9, ref=1.0)
        assert t3 == pytest.approx(4 * np.finfo(np.float32).eps)

    def test_never_loosens_above_the_floor(self):
        # unlike cg_adaptive (eta_max = 0.1), endgame mode is capped at
        # the cg_tol knee even on the first step / unset ref
        t, _ = self._tol(np.float32, dxn=0.0, ref=np.nan, it=1)
        assert t == pytest.approx(3e-4)

    def test_f64_is_exempt(self):
        # f64's sqrt(eps) floor already places the inexact fixed point
        # ~1e-16 relative away; endgame mode must not alter the f64
        # oracle trajectories
        t, _ = self._tol(np.float64, dxn=1e-3, ref=1.0)
        assert t == pytest.approx(np.finfo(np.float64).eps ** 0.5)

    def test_explicit_cg_adaptive_wins(self):
        from scso_tpu.algorithms.steps import _forcing_tol

        m = scso.ProxGGNSCORE(solver="cg", cg_adaptive=True)
        x = jnp.zeros(4, np.float32)
        xp = x.at[0].set(1.0)
        t, _ = _forcing_tol(m, jnp.ones(4, np.float32), x, xp,
                            jnp.asarray(1.0, np.float32), jnp.int32(5),
                            endgame=True)
        assert float(t) == pytest.approx(0.1)  # EW eta_max, not the knee
