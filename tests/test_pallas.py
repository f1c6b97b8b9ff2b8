"""Pallas kernel tests (interpret mode on the CPU backend).

Validates the fused kernels bit-for-bit against the jnp/XLA reference
paths: the single-pass normal-equation matvec (ops/pallas/matvec) and the
fused damped-prox SCORE update (ops/pallas/score_update), both standalone
and end-to-end through solves with kernels='pallas'.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.ops.pallas.matvec import (
    fused_normal_matvec,
    supports_fused_normal_matvec,
)
from scso_tpu.ops.pallas.score_update import fused_score_update
from scso_tpu.ops.prox import prox_step
from scso_tpu.ops.smoothers import get_Mg, phuber_grad, phuber_hess


class TestFusedNormalMatvec:
    @pytest.mark.parametrize("m,n", [(64, 128), (500, 256), (37, 128)])
    def test_matches_two_matmuls(self, m, n):
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.standard_normal((m, n)))
        w = jnp.asarray(rng.random(m))
        v = jnp.asarray(rng.standard_normal(n))
        got = fused_normal_matvec(A, w, v)
        ref = A.T @ (w * (A @ v))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)

    def test_fallback_on_ragged_n(self):
        # n % 128 != 0 → falls back to the jnp path, still correct
        rng = np.random.default_rng(1)
        A = jnp.asarray(rng.standard_normal((64, 100)))
        w = jnp.asarray(rng.random(64))
        v = jnp.asarray(rng.standard_normal(100))
        assert not supports_fused_normal_matvec(64, 100)
        got = fused_normal_matvec(A, w, v)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(A.T @ (w * (A @ v))))

    def test_support_check_is_itemsize_aware(self):
        """The VMEM feasibility check must use the SAME itemsize the
        kernel sizes its tiles with: at n=7040 an f32 tile fits scoped
        VMEM but an f64 tile does not — with the old default-itemsize
        check, f64 inputs passed the gate and OOM'd Mosaic's scoped
        VMEM on device instead of taking the jnp fallback."""
        from scso_tpu.ops.pallas import counters

        n = 7040  # first 128-multiple where f32 fits and f64 doesn't
        assert supports_fused_normal_matvec(1024, n, 4)
        assert not supports_fused_normal_matvec(1024, n, 8)
        rng = np.random.default_rng(5)
        A = jnp.asarray(rng.standard_normal((64, n)))  # f64 under x64
        assert A.dtype == jnp.float64  # test premise
        w = jnp.asarray(rng.random(64))
        v = jnp.asarray(rng.standard_normal(n))
        counters.reset()
        got = fused_normal_matvec(A, w, v)
        assert counters.KERNEL_HITS["fused_normal_matvec"] == 0  # fallback
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(A.T @ (w * (A @ v))))

    def test_multi_row_block_grid(self):
        """Row counts that straddle the VMEM-budget block size: f64 n=2048
        gives block_rows=256, so m ∈ {256, 257, 600, 1024} covers exactly-
        one-block, one-past-boundary, ragged-multi-block and exact-multi-
        block grids. Guards the accumulator across sequential grid steps."""
        from scso_tpu.ops.pallas.matvec import _pick_block_rows

        n = 2048
        br = _pick_block_rows(10**6, n, 8)
        assert br == 256  # test premise: multi-block at the m values below
        rng = np.random.default_rng(14)
        for m in (br, br + 1, 600, 4 * br):
            A = jnp.asarray(rng.standard_normal((m, n)))
            w = jnp.asarray(rng.random(m))
            v = jnp.asarray(rng.standard_normal(n))
            assert supports_fused_normal_matvec(m, n)
            got = fused_normal_matvec(A, w, v)
            ref = A.T @ (w * (A @ v))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-10, atol=1e-10)

    def test_glm_weights_match_hvp(self):
        """Aᵀ(hvp_w∘(Av)) must equal the AD Hessian-vector product."""
        rng = np.random.default_rng(2)
        m, n = 256, 128
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            m, n, density=0.3, n_active=8, seed=3, dtype=np.float64)
        prob = scso.Problem(A, y, x0, losses.logistic_f, 0.1,
                            dtype=np.float64)
        x = jnp.asarray(rng.standard_normal(n))
        v = jnp.asarray(rng.standard_normal(n))
        w = losses.logistic_hvp_w(prob.A, prob.y, x)
        got = fused_normal_matvec(prob.A, w, v)
        ref = prob.hvp_f(prob.A, prob.y, x, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)

    def test_glm_weights_match_ggn(self):
        """Aᵀ(ggn_w∘(Av)) must equal Jᵀ(Q(Jv)) via jvp/vjp."""
        rng = np.random.default_rng(4)
        m, n = 256, 128
        A, y01, x0, _ = synthetic.make_sparse_logreg_data(
            m, n, density=0.3, n_active=8, seed=5, dtype=np.float64)
        prob = scso.Problem(
            A, y01, x0, losses.logistic_f, 0.1,
            out_fn=losses.sigmoid_out,
            grad_fy=losses.logistic_ggn_residual,
            hess_fy_diag=losses.logistic_ggn_qdiag,
            dtype=np.float64)
        x = jnp.asarray(rng.standard_normal(n) * 0.1)
        v = jnp.asarray(rng.standard_normal(n))
        w = losses.logistic_ggn_w(prob.A, prob.y, x)
        got = fused_normal_matvec(prob.A, w, v)
        _, _, q = prob.ggn_residual_qdiag(prob.A, prob.y, x)
        _, jt = prob.vjp_out(prob.A, x)
        ref = jt(q * prob.jvp_out(prob.A, x, v))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)


class TestFusedScoreUpdate:
    # n values straddle the 64×128 = 8192-element block: 1000 (single
    # partial block), 8192 (exactly one block), 8320/16384/131072 (multi-
    # block, nc > 1 — regression for the phase-0 index map that pinned the
    # η² reduction to block 0 and mis-damped every n > 8192 solve)
    @pytest.mark.parametrize("n", [1000, 8192, 8320, 16384, 131072])
    @pytest.mark.parametrize("reg", ["l1", "l2", "indbox"])
    def test_matches_jnp_tail(self, reg, n):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal(n))
        d = jnp.asarray(rng.standard_normal(n))
        mu, lam, ss = 0.8, 0.05, 0.5
        lgr = lam * phuber_grad(x, mu)
        hr = phuber_hess(x, mu)
        Mg = get_Mg(2.0, 2.6, mu, n)
        lb = jnp.full((n,), -0.4)
        ub = jnp.full((n,), 0.4)

        hinv = 1.0 / hr
        eta = jnp.sqrt(jnp.sum(lgr * hinv * lgr))
        safe = jnp.minimum(1.0, ss / (1.0 + Mg * eta))
        xs = x + safe * d
        ref = prox_step(reg, xs, hinv, lam, ss, lb=lb, ub=ub)
        pri_ref = jnp.linalg.norm(ref - x)

        got, pri, safe_got = fused_score_update(
            x, d, lgr, hr, lam, ss, Mg, reg, lb=lb, ub=ub)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-13)
        assert float(pri) == pytest.approx(float(pri_ref), rel=1e-12)
        assert float(safe_got) == pytest.approx(float(safe), rel=1e-12)

    def test_no_prox(self):
        rng = np.random.default_rng(7)
        n = 130  # ragged: exercises padding
        x = jnp.asarray(rng.standard_normal(n))
        d = jnp.asarray(rng.standard_normal(n))
        lgr = 0.1 * phuber_grad(x, 1.0)
        hr = phuber_hess(x, 1.0)
        Mg = get_Mg(2.0, 2.6, 1.0, n)
        got, pri, safe = fused_score_update(
            x, d, lgr, hr, 0.1, 0.5, Mg, "l1", use_prox=False)
        ref = x + safe * d
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-14)
        assert float(pri) == pytest.approx(
            float(jnp.linalg.norm(safe * d)), abs=1e-12)


def make_glm_problem(m=64, n=128, seed=0):
    # 0/1 labels — the correct coding for the GGN cross-entropy pieces
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.3, n_active=8, seed=seed, dtype=np.float64,
        label01=True)
    return scso.Problem(
        A, y, x0, losses.logistic01_f, 1e-2,
        grad_fx=losses.logistic01_grad, hess_fx=losses.logistic01_hess,
        out_fn=losses.sigmoid_out,
        grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM,
        dtype=np.float64)


class TestEndToEndPallas:
    """Full solves with kernels='pallas' (interpret mode on CPU) must
    match the XLA path to float64 precision."""

    # greedy_alpha off: its discrete accept/reject branch turns last-ulp
    # kernel differences into different trajectories — this test pins
    # KERNEL equivalence on the (branch-free) damped iteration
    @pytest.mark.parametrize("method_xla,method_pal", [
        (scso.ProxNSCORE(solver="cg", kernels="xla", greedy_alpha=False),
         scso.ProxNSCORE(solver="cg", kernels="pallas",
                         greedy_alpha=False)),
        (scso.ProxGGNSCORE(solver="cg", kernels="xla",
                           greedy_alpha=False),
         scso.ProxGGNSCORE(solver="cg", kernels="pallas",
                           greedy_alpha=False)),
        (scso.ProxLQNSCORE(kernels="xla"),
         scso.ProxLQNSCORE(kernels="pallas")),
    ])
    def test_solver_parity(self, method_xla, method_pal):
        prob = make_glm_problem()
        sm = scso.PHuberSmootherL1L2(1.0)
        opts = dict(max_epoch=40, verbose=0)
        s_ref = scso.iterate(method_xla, prob, "l1", sm, **opts)
        s_pal = scso.iterate(method_pal, prob, "l1", sm, **opts)
        np.testing.assert_allclose(s_pal.x, s_ref.x, atol=1e-7)
        assert s_pal.epochs == s_ref.epochs

    def test_auto_resolves_to_xla_on_cpu(self):
        from scso_tpu.algorithms.iterate import _resolve_kernels
        prob = make_glm_problem()
        m = _resolve_kernels(scso.ProxNSCORE(), prob)
        assert m.kernels == "xla"


class TestFusedTwoLoop:
    def test_matches_scan_two_loop(self):
        from scso_tpu.ops.lbfgs_core import init_memory, two_loop, update_memory
        from scso_tpu.ops.pallas.two_loop import fused_two_loop

        rng = np.random.default_rng(8)
        n, m = 300, 5
        mem = init_memory(n, m, np.float64)
        # push 7 pairs (wraps the circular buffer)
        for i in range(7):
            delta = jnp.asarray(rng.standard_normal(n) * 0.1)
            gamma = delta * (1.0 + 0.1 * i) + 0.01 * jnp.asarray(
                rng.standard_normal(n))
            mem = update_memory(mem, delta, gamma)
        g = jnp.asarray(rng.standard_normal(n))
        ref = two_loop(mem, g)
        got = fused_two_loop(mem, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)

    def test_large_n_lane_padding(self):
        """n ≫ one 8×128 tile with ragged lane padding (n = 16500)."""
        from scso_tpu.ops.lbfgs_core import init_memory, two_loop, update_memory
        from scso_tpu.ops.pallas.two_loop import fused_two_loop

        rng = np.random.default_rng(15)
        n, m = 16500, 4
        mem = init_memory(n, m, np.float64)
        for i in range(3):
            delta = jnp.asarray(rng.standard_normal(n) * 0.1)
            gamma = delta * (1.0 + 0.1 * i) + 0.01 * jnp.asarray(
                rng.standard_normal(n))
            mem = update_memory(mem, delta, gamma)
        g = jnp.asarray(rng.standard_normal(n))
        np.testing.assert_allclose(np.asarray(fused_two_loop(mem, g)),
                                   np.asarray(two_loop(mem, g)),
                                   rtol=1e-11, atol=1e-11)

    def test_empty_memory(self):
        from scso_tpu.ops.lbfgs_core import init_memory
        from scso_tpu.ops.pallas.two_loop import fused_two_loop

        mem = init_memory(64, 10, np.float64)
        g = jnp.asarray(np.random.default_rng(9).standard_normal(64))
        got = fused_two_loop(mem, g)
        np.testing.assert_allclose(np.asarray(got), -np.asarray(g),
                                   atol=1e-15)


class TestMixedPrecision:
    def test_bf16_matvec_coarse_accuracy(self):
        from scso_tpu.ops.pallas.matvec import fused_normal_matvec

        rng = np.random.default_rng(10)
        m, n = 256, 128
        A = rng.standard_normal((m, n)).astype(np.float32)
        w = rng.random(m).astype(np.float32)
        v = rng.standard_normal(n).astype(np.float32)
        ref = A.T @ (w * (A @ v))
        got = fused_normal_matvec(
            jnp.asarray(A, jnp.bfloat16), jnp.asarray(w), jnp.asarray(v))
        assert got.dtype == jnp.float32
        rel = np.abs(np.asarray(got) - ref).max() / np.abs(ref).max()
        assert rel < 0.05  # bf16 coarse accuracy

    def test_iterate_mixed_reaches_tolerance(self):
        from scso_tpu.algorithms.mixed import iterate_mixed

        prob = make_glm_problem(m=128, n=128)
        sm = scso.PHuberSmootherL1L2(1.0)
        # fixed forcing: the comparison wants both runs driven to the
        # same tight endgame, not the adaptive default's early stall
        meth = scso.ProxGGNSCORE(solver="cg", cg_adaptive=False)
        ref = scso.iterate(meth, prob, "l1", sm,
                           max_epoch=60, verbose=0)
        mixed = iterate_mixed(meth, prob, "l1",
                              sm, coarse_f_tol=1e-2, coarse_max_epoch=30,
                              max_epoch=60, verbose=0)
        # different trajectory (coarse start) → same minimum to ~1e-3
        np.testing.assert_allclose(mixed.x, ref.x, atol=5e-3)
        np.testing.assert_allclose(mixed.obj[-1], ref.obj[-1], rtol=1e-4)
        assert mixed.cg_info["coarse_epochs"] >= 1

    def test_iterate_mixed_generic_problem_passthrough(self):
        from scso_tpu.algorithms.mixed import iterate_mixed

        x0 = np.array([0.2, -0.5])
        prob = scso.Problem(x0, losses.rosenbrock, 1e-8, dtype=np.float64)
        sol = iterate_mixed(scso.ProxLQNSCORE(), prob, "l1",
                            scso.PHuberSmootherL1L2(1.0), max_epoch=2000,
                            verbose=0)
        np.testing.assert_allclose(sol.x, [1.0, 1.0], atol=1e-3)


class TestPrecisionAdaptiveCG:
    """Precision-adaptive CG (ProxGGNSCORE.cg_lp_tol + Problem.A_lp):
    epochs whose forcing tolerance is loose run their curvature matvecs
    on a low-precision data copy; the RHS stays full precision."""

    def _prob(self, **kw):
        return make_glm_problem(m=512, n=128, **kw)

    def _solve(self, prob, method):
        sm = scso.PHuberSmootherL1L2(1.0)
        return scso.iterate(method, prob, "l1", sm, max_epoch=120,
                            verbose=0)

    def test_off_by_default_and_gates_bitmatch(self):
        from scso_tpu._src.struct import replace as dc_replace

        prob = self._prob()
        # epoch_cache=False on every method here so bitwise comparisons
        # hold both sides on the uncached path (the cached path covers
        # lp in TestPrecisionAdaptiveCGEndgame)
        base = self._solve(prob, scso.ProxGGNSCORE(
            solver="cg", cg_adaptive=True, epoch_cache=False))
        # same-dtype copy: identical math whichever branch runs
        p_same = scso.with_lp_copy(prob, dtype=prob.A.dtype)
        s_same = self._solve(p_same, scso.ProxGGNSCORE(
            solver="cg", cg_adaptive=True, cg_lp_tol=1e-2,
            epoch_cache=False))
        np.testing.assert_array_equal(s_same.x, base.x)
        # poisoned copy + never-lp threshold: the gate must keep it out
        p_poison = dc_replace(prob, A_lp=jnp.zeros_like(prob.A))
        s_never = self._solve(p_poison, scso.ProxGGNSCORE(
            solver="cg", cg_adaptive=True, cg_lp_tol=1e30,
            epoch_cache=False))
        np.testing.assert_array_equal(s_never.x, base.x)
        # cg_lp_tol left at 0.0: A_lp present but ignored
        s_off = self._solve(p_poison, scso.ProxGGNSCORE(
            solver="cg", cg_adaptive=True, epoch_cache=False))
        np.testing.assert_array_equal(s_off.x, base.x)

    def test_lp_branch_actually_executes(self):
        """Positive proof the cond picks the copy on loose epochs: a
        poisoned (zero) A_lp with an engaging threshold must change the
        trajectory vs the plain solve."""
        from scso_tpu._src.struct import replace as dc_replace

        prob = self._prob()
        base = self._solve(prob, scso.ProxGGNSCORE(solver="cg",
                                                   cg_adaptive=True))
        p_poison = dc_replace(prob, A_lp=jnp.zeros_like(prob.A))
        s = self._solve(p_poison, scso.ProxGGNSCORE(
            solver="cg", cg_adaptive=True, cg_lp_tol=1e-2))
        assert not np.array_equal(s.x, base.x)

    def test_lp_tol_at_or_below_floor_is_refused(self):
        """cg_lp_tol <= the CG tolerance floor would keep the bf16
        matvec engaged through the endgame (CG chasing a residual below
        the copy's own error) — the gate disables it with a warning and
        the solve proceeds in full precision."""
        import warnings

        prob = scso.with_lp_copy(self._prob())
        base = self._solve(prob, scso.ProxGGNSCORE(solver="cg",
                                                   cg_adaptive=True))
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            s = self._solve(prob, scso.ProxGGNSCORE(
                solver="cg", cg_adaptive=True, cg_lp_tol=1e-12))
        np.testing.assert_array_equal(s.x, base.x)
        assert any("cg_lp_tol" in str(w.message) for w in rec)

    @pytest.mark.parametrize("kernels", ["xla", "pallas"])
    def test_bf16_copy_reaches_same_optimum(self, kernels):
        prob = scso.with_lp_copy(self._prob())  # bf16 copy
        base = self._solve(prob, scso.ProxGGNSCORE(
            solver="cg", cg_adaptive=True, kernels=kernels))
        lp = self._solve(prob, scso.ProxGGNSCORE(
            solver="cg", cg_adaptive=True, cg_lp_tol=1e-2,
            kernels=kernels))
        np.testing.assert_allclose(lp.obj[-1], base.obj[-1], rtol=1e-7)
        np.testing.assert_allclose(lp.x, base.x, atol=1e-5)

    def test_requires_data_problem(self):
        x0 = np.array([0.2, -0.5])
        prob = scso.Problem(x0, losses.rosenbrock, 1e-8, dtype=np.float64)
        with pytest.raises(ValueError, match="data problem"):
            scso.with_lp_copy(prob)


class TestPrecisionAdaptiveCGEndgame:
    """Round-4 lp regime: under the default tightening-only forcing
    (f32, cg_adaptive=False) cg_lp_tol == the CG floor engages the
    low-precision matvec through the whole bulk phase (where the
    forcing sits AT the floor) and drops back to the f32 operator once
    the endgame tightens below it — including on the epoch-cached path
    (_ggn_cg_from_cache routes curvature matvecs through A_lp)."""

    FLOOR = 3e-4  # steps._cg_tol f32 AUTO value

    def _prob(self, m=512, n=128, seed=0):
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            m, n, density=0.3, n_active=8, seed=seed, dtype=np.float32,
            label01=True)
        return scso.Problem(
            A, y, x0, losses.logistic01_f, 1e-2,
            grad_fx=losses.logistic01_grad,
            out_fn=losses.sigmoid_out,
            grad_fy=losses.logistic_ggn_residual,
            hess_fy_diag=losses.logistic_ggn_qdiag,
            loss_fn=losses.logistic_loss_01,
            hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
            glm=losses.LOGISTIC01_GLM, dtype=np.float32)

    def _solve(self, prob, method, **kw):
        kw.setdefault("max_epoch", 120)
        return scso.iterate(method, prob, "l1",
                            scso.PHuberSmootherL1L2(1.0), verbose=0, **kw)

    @pytest.mark.parametrize("cache", [None, False])
    def test_floor_threshold_engages(self, cache):
        """Poisoned (zero) copy + lp_tol == floor must change the
        trajectory vs the plain solve — positive proof the cond picks
        the copy in the bulk phase, cached and uncached."""
        from scso_tpu._src.struct import replace as dc_replace

        prob = self._prob()
        base = self._solve(prob, scso.ProxGGNSCORE(solver="cg",
                                                   epoch_cache=cache))
        p_poison = dc_replace(prob, A_lp=jnp.zeros_like(prob.A))
        s = self._solve(p_poison, scso.ProxGGNSCORE(
            solver="cg", cg_lp_tol=self.FLOOR, epoch_cache=cache))
        assert not np.array_equal(s.x, base.x)

    def test_same_dtype_copy_bitmatch_cached(self):
        """A same-dtype copy is identical math whichever cond branch
        runs — the cached lp solve must bit-match the no-lp one."""
        prob = self._prob()
        base = self._solve(prob, scso.ProxGGNSCORE(solver="cg"))
        p_same = scso.with_lp_copy(prob, dtype=prob.A.dtype)
        s = self._solve(p_same, scso.ProxGGNSCORE(
            solver="cg", cg_lp_tol=self.FLOOR))
        np.testing.assert_array_equal(s.x, base.x)

    def test_adaptive_refuses_floor_threshold(self):
        """With cg_adaptive the forcing never passes below the floor,
        so lp_tol == floor would pin the copy through the endgame —
        refused with a warning, solve proceeds in full precision."""
        import warnings

        prob = scso.with_lp_copy(self._prob())
        base = self._solve(prob, scso.ProxGGNSCORE(
            solver="cg", cg_adaptive=True, epoch_cache=False))
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            s = self._solve(prob, scso.ProxGGNSCORE(
                solver="cg", cg_adaptive=True, cg_lp_tol=self.FLOOR,
                epoch_cache=False))
        np.testing.assert_array_equal(s.x, base.x)
        assert any("cg_lp_tol" in str(w.message) for w in rec)

    def test_bf16_bulk_reaches_same_optimum(self):
        prob = scso.with_lp_copy(self._prob())  # bf16 copy
        base = self._solve(prob, scso.ProxGGNSCORE(solver="cg"))
        lp = self._solve(prob, scso.ProxGGNSCORE(
            solver="cg", cg_lp_tol=self.FLOOR))
        np.testing.assert_allclose(lp.obj[-1], base.obj[-1], rtol=1e-5)
        np.testing.assert_allclose(lp.x, base.x, atol=1e-3)


class TestAutoLP:
    """ProxGGNSCORE.auto_lp: `solve` attaches the bf16 copy itself and
    sets cg_lp_tol to the CG floor in the measured-win regime (TPU,
    A >= 2 GiB, f32 GLM full-batch unsharded CG). auto_lp=True skips
    the backend/size gates so CPU tests can drive the mechanism."""

    def _prob(self, dtype=np.float32):
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            512, 128, density=0.3, n_active=8, seed=1, dtype=dtype,
            label01=True)
        return scso.Problem(
            A, y, x0, losses.logistic01_f, 1e-2,
            grad_fx=losses.logistic01_grad,
            out_fn=losses.sigmoid_out,
            grad_fy=losses.logistic_ggn_residual,
            hess_fy_diag=losses.logistic_ggn_qdiag,
            loss_fn=losses.logistic_loss_01,
            hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
            glm=losses.LOGISTIC01_GLM, dtype=dtype)

    def test_resolver_gates(self):
        import dataclasses as dc

        from scso_tpu.algorithms.iterate import Options, _auto_lp

        prob = self._prob()
        m = scso.ProxGGNSCORE(solver="cg")
        opts = Options()
        # default AUTO stays off here (CPU backend / tiny A)
        m2, p2 = _auto_lp(m, prob, opts)
        assert getattr(p2, "A_lp", None) is None and m2.cg_lp_tol == 0.0
        # True skips the backend/size gates: copy attached, floor set
        m3, p3 = _auto_lp(dc.replace(m, auto_lp=True), prob, opts)
        assert p3.A_lp is not None and p3.A_lp.dtype == jnp.bfloat16
        assert m3.cg_lp_tol == pytest.approx(3e-4)
        # correctness gates hold even when forced
        for bad_m, bad_p, bad_o in [
            (dc.replace(m, auto_lp=True, cg_adaptive=True), prob, opts),
            (dc.replace(m, auto_lp=True, cg_lp_tol=1e-2), prob, opts),
            (dc.replace(m, auto_lp=True, curvature_rows=64), prob, opts),
            (dc.replace(m, auto_lp=True), self._prob(np.float64), opts),
            (dc.replace(m, auto_lp=True), prob,
             dc.replace(opts, batch_size=128)),
            (dc.replace(m, auto_lp=True), prob,
             dc.replace(opts, vmap_safe=True)),
            (dc.replace(m, auto_lp=False), prob, opts),
        ]:
            mm, pp = _auto_lp(bad_m, bad_p, bad_o)
            assert getattr(pp, "A_lp", None) is None, (bad_m, bad_o)

    def test_forced_auto_solve_matches_plain(self):
        prob = self._prob()
        sm = scso.PHuberSmootherL1L2(1.0)
        base = scso.iterate(scso.ProxGGNSCORE(solver="cg"), prob, "l1",
                            sm, max_epoch=120, verbose=0)
        s = scso.iterate(scso.ProxGGNSCORE(solver="cg", auto_lp=True),
                         prob, "l1", sm, max_epoch=120, verbose=0)
        np.testing.assert_allclose(s.obj[-1], base.obj[-1], rtol=1e-5)
        np.testing.assert_allclose(s.x, base.x, atol=1e-3)


class TestSubsampledCurvature:
    """ProxGGNSCORE.curvature_rows: exact RHS, strided-subsample GGN
    curvature (inexact subsampled proximal Newton) — each CG matvec
    streams m_sub/m of the data."""

    def _prob(self, m=2048, n=64, seed=4):
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            m, n, density=0.15, n_active=12, seed=seed,
            dtype=np.float64, label01=True)
        return scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                            grad_fx=losses.logistic01_grad,
                            glm=losses.LOGISTIC01_GLM, dtype=np.float64)

    def test_full_subsample_is_noop(self):
        prob = self._prob()
        base = scso.iterate(scso.ProxGGNSCORE(solver="cg",
                                              cg_adaptive=True),
                            prob, "l1", scso.PHuberSmootherL1L2(1.0), max_epoch=120,
                            verbose=0)
        same = scso.iterate(scso.ProxGGNSCORE(solver="cg",
                                              cg_adaptive=True,
                                              curvature_rows=10**9),
                            prob, "l1", scso.PHuberSmootherL1L2(1.0), max_epoch=120,
                            verbose=0)
        np.testing.assert_array_equal(same.x, base.x)

    def test_quarter_subsample_same_optimum(self):
        """m/4 curvature rows: same optimum to ~1e-3 relative, with the
        expected trade (more CG iterations, each streaming m/4 rows)."""
        prob = self._prob()
        base = scso.iterate(scso.ProxGGNSCORE(solver="cg",
                                              cg_adaptive=True),
                            prob, "l1", scso.PHuberSmootherL1L2(1.0), max_epoch=200,
                            verbose=0)
        sub = scso.iterate(scso.ProxGGNSCORE(solver="cg",
                                             cg_adaptive=True,
                                             curvature_rows=512),
                           prob, "l1", scso.PHuberSmootherL1L2(1.0), max_epoch=200,
                           verbose=0)
        rel = abs(sub.obj[-1] - base.obj[-1]) / abs(base.obj[-1])
        assert rel < 1e-3, rel
        assert np.all(np.isfinite(sub.x))

    def test_thin_subsample_warns(self):
        import warnings

        prob = self._prob(m=512, n=64)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            scso.iterate(scso.ProxGGNSCORE(solver="cg", cg_adaptive=True,
                                           curvature_rows=32),
                         prob, "l1", scso.PHuberSmootherL1L2(1.0), max_epoch=5, verbose=0)
        assert any("curvature_rows" in str(w.message) for w in rec)


class TestGGNConvergence:
    def test_ggn_01_labels_matches_newton(self):
        """Regression: GGN with the 0/1-label cross-entropy family must
        CONVERGE (the ±1-label quirk gives an indefinite Q and diverges
        on real data) and agree with Newton-CG on the same objective."""
        prob = make_glm_problem(m=256, n=32)
        sm = scso.PHuberSmootherL1L2(1.0)
        sn = scso.iterate(scso.ProxNSCORE(solver="cg"), prob, "l1", sm,
                          max_epoch=100, verbose=0)
        sg = scso.iterate(scso.ProxGGNSCORE(solver="cg"), prob, "l1", sm,
                          max_epoch=100, verbose=0)
        assert sg.obj[-1] <= sg.obj[0]  # monotone progress, no blow-up
        # GGN and Newton approach the same minimum at different rates;
        # within the epoch cap they agree to ~1e-3
        np.testing.assert_allclose(sg.obj[-1], sn.obj[-1], rtol=1e-3)
        np.testing.assert_allclose(sg.x, sn.x, atol=0.05)


class TestSaturationStability:
    def test_glm_weights_finite_under_saturation(self):
        """|z| > 17 rounds sigmoid to exactly 0/1 in f32; the stable
        product forms must stay finite (the naive composition NaNs and
        silently zeroes CG — the 720-epoch bench regression)."""
        z = jnp.asarray(np.array([-40.0, -20.0, 0.0, 20.0, 40.0]),
                        jnp.float32)
        y = jnp.asarray(np.array([0.0, 1.0, 1.0, 0.0, 1.0]), jnp.float32)
        g = losses.LOGISTIC01_GLM
        assert np.all(np.isfinite(np.asarray(g.ggn_w(y, z))))
        assert np.all(np.isfinite(np.asarray(g.ggn_rw(y, z))))
        A = jnp.ones((5, 4), jnp.float32)
        x = jnp.ones((4,), jnp.float32) * 10.0  # z = 40 everywhere
        assert np.all(np.isfinite(np.asarray(
            losses.logistic_ggn_w(A, y, x))))

    def test_saturated_start_converges(self):
        """GGN-CG from a far start (saturated sigmoids) must do real CG
        work and descend — f32 end to end."""
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            512, 256, density=0.3, n_active=16, seed=11, dtype=np.float32,
            label01=True)
        prob = scso.Problem(
            A, np.asarray(y), np.asarray(x0) * 3.0,  # push z into saturation
            losses.logistic01_f, 1e-2,
            grad_fx=losses.logistic01_grad,
            glm=losses.LOGISTIC01_GLM, dtype=np.float32)
        sm = scso.PHuberSmootherL1L2(1.0)
        sol = scso.iterate(scso.ProxGGNSCORE(solver="cg"), prob, "l1", sm,
                           max_epoch=60, verbose=0)
        assert np.all(np.isfinite(sol.x))
        assert sol.obj[-1] < sol.obj[0]
        assert sol.cg_info and sol.cg_info["total_cg_iters"] > 0

    def test_stable_forms_match_naive_when_unsaturated(self):
        rng = np.random.default_rng(12)
        z = jnp.asarray(rng.uniform(-5, 5, 64), jnp.float64)
        y = jnp.asarray((rng.random(64) < 0.5).astype(np.float64))
        g = losses.LOGISTIC01_GLM
        yhat = g.link(z)
        sp = g.dlink(z)
        np.testing.assert_allclose(np.asarray(g.ggn_w(y, z)),
                                   np.asarray(sp * sp * g.qdiag(y, yhat)),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g.ggn_rw(y, z)),
                                   np.asarray(sp * g.res(y, yhat)),
                                   rtol=1e-10)


class TestFusedGLMPrep:
    def test_multi_tile_normalization(self):
        """fused_glm_prep evaluates the spec fns PER TILE; the 1/m loss
        normalization must be rescaled from the tile size to the true m
        (regression: single-tile test shapes masked the br==m case)."""
        import jax
        from scso_tpu.algorithms.steps import ggn_step
        from scso_tpu.ops.lbfgs_core import init_memory
        from scso_tpu._src.struct import replace as dc_replace

        # n=2048, f64: block rows = 256 → m=1024 gives 4 tiles
        m, n = 1024, 2048
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            m, n, density=0.02, n_active=16, seed=6, dtype=np.float64,
            label01=True)
        prob = scso.Problem(A, y, np.asarray(x0) * 0.05,
                            losses.logistic01_f, 1e-2,
                            grad_fx=losses.logistic01_grad,
                            glm=losses.LOGISTIC01_GLM, dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(1.0)
        mem = init_memory(n, 1, np.float64)

        def step(kernels):
            meth = scso.ProxGGNSCORE(solver="cg", cg_tol=1e-12,
                                     kernels=kernels, use_fused_prep=True)
            x = jnp.asarray(prob.x0)
            return ggn_step(meth, prob, "l1", sm, prob.A, prob.y, x, x,
                            jnp.zeros_like(x), jnp.int32(1), mem).x_new

        np.testing.assert_allclose(np.asarray(step("pallas")),
                                   np.asarray(step("xla")), atol=1e-9)

    def test_prep_kernel_actually_engages(self):
        """Spy check: the fused prep kernel must be CALLED on the pallas
        GGN path (regression: a silent no-op edit once left the import in
        place but never wired the branch, and the parity test passed
        vacuously)."""
        from scso_tpu.algorithms import steps as steps_mod
        from scso_tpu.algorithms.steps import ggn_step
        from scso_tpu.ops.lbfgs_core import init_memory

        calls = []
        orig = steps_mod.fused_glm_prep

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        steps_mod.fused_glm_prep = spy
        try:
            m, n = 64, 128
            A, y, x0, _ = synthetic.make_sparse_logreg_data(
                m, n, density=0.3, n_active=8, seed=6, dtype=np.float64,
                label01=True)
            prob = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                                glm=losses.LOGISTIC01_GLM, dtype=np.float64)
            sm = scso.PHuberSmootherL1L2(1.0)
            mem = init_memory(n, 1, np.float64)
            meth = scso.ProxGGNSCORE(solver="cg", kernels="pallas",
                                     use_fused_prep=True)
            x = jnp.asarray(prob.x0)
            ggn_step(meth, prob, "l1", sm, prob.A, prob.y, x, x,
                     jnp.zeros_like(x), jnp.int32(1), mem)
        finally:
            steps_mod.fused_glm_prep = orig
        assert calls, "fused_glm_prep was never invoked on the pallas path"




class TestSeededFuzzShapes:
    """Trimmed seeded subset of benchmarks/fuzz_kernels.py: random odd
    shapes the hand-picked parametrizations above don't cover (non-128-
    multiple n for the update kernel, ragged m row-padding for the data
    kernels, partially-filled L-BFGS memory). The full 155-shape fuzz runs
    offline; these pin the classes of shape it exercised."""

    @pytest.mark.parametrize("m,n", [(947, 384), (2249, 1920), (131, 128)])
    def test_matvec_ragged_m(self, m, n):
        rng = np.random.default_rng(m * 7 + n)
        A = rng.standard_normal((m, n)).astype(np.float32)
        w = rng.random(m).astype(np.float32)
        v = rng.standard_normal(n).astype(np.float32)
        got = fused_normal_matvec(jnp.asarray(A), jnp.asarray(w),
                                  jnp.asarray(v))
        want = A.T @ (w * (A @ v))
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=3e-5 * scale)

    @pytest.mark.parametrize("n,reg", [(7, "l1"), (129, "l2"),
                                       (9001, "indbox"), (23456, "l1")])
    def test_score_update_odd_n(self, n, reg):
        rng = np.random.default_rng(n)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        lgr_np = rng.standard_normal(n).astype(np.float32)
        lgr_np[rng.random(n) < 0.1] = 0.0  # the η 0/0 fix path
        lgr = jnp.asarray(lgr_np)
        hr = jnp.asarray((rng.random(n) + 1e-3).astype(np.float32))
        lam, ss, Mg = 0.07, 0.6, 3.0
        lb = jnp.full((n,), -0.5, jnp.float32)
        ub = jnp.full((n,), 0.7, jnp.float32)

        hinv = 1.0 / hr
        terms = jnp.where(lgr == 0, 0.0, lgr * hinv * lgr)
        eta = jnp.sqrt(jnp.sum(terms))
        safe = jnp.minimum(1.0, ss / (1.0 + Mg * eta))
        ref = prox_step(reg, x + safe * d, hinv, lam, ss, lb=lb, ub=ub)

        got, pri, _ = fused_score_update(x, d, lgr, hr, lam, ss, Mg, reg,
                                         lb=lb, ub=ub)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        assert float(pri) == pytest.approx(
            float(jnp.linalg.norm(ref - x)), rel=1e-4)

    @pytest.mark.parametrize("n,mm,k", [(777, 9, 18), (2784, 10, 20),
                                        (361, 9, 9)])
    def test_two_loop_partial_memory(self, n, mm, k):
        from scso_tpu.ops.lbfgs_core import (init_memory, two_loop,
                                             update_memory)
        from scso_tpu.ops.pallas.two_loop import fused_two_loop

        rng = np.random.default_rng(n + k)
        mem = init_memory(n, mm, np.float32)
        # SPD-quadratic curvature pairs keep rho well-conditioned so the
        # two orderings agree to f32 precision
        bdiag = (rng.random(n) * 4 + 0.5).astype(np.float32)
        for _ in range(k):
            dlt = (rng.standard_normal(n) * 0.1).astype(np.float32)
            mem = update_memory(mem, jnp.asarray(dlt),
                                jnp.asarray(bdiag * dlt))
        g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        got = fused_two_loop(mem, g)
        want = two_loop(mem, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=1e-5)

    @pytest.mark.parametrize("m,n", [(660, 256), (3465, 2432)])
    def test_glm_prep_ragged_m(self, m, n):
        from scso_tpu.ops.pallas.glm_prep import fused_glm_prep

        rng = np.random.default_rng(m)
        A = rng.standard_normal((m, n)).astype(np.float32)
        y = (rng.random(m) > 0.5).astype(np.float32)
        x = (rng.standard_normal(n) * 0.1).astype(np.float32)
        rw_fn = lambda yb, zb: jax.nn.sigmoid(zb) - yb
        w_fn = lambda yb, zb: jax.nn.sigmoid(zb) * (1 - jax.nn.sigmoid(zb))
        got_w, got_b, got_h = fused_glm_prep(
            jnp.asarray(A), jnp.asarray(y), jnp.asarray(x), rw_fn, w_fn)
        z = A @ x
        sig = 1 / (1 + np.exp(-z.astype(np.float64)))
        want_w = sig * (1 - sig)
        want_b = A.T.astype(np.float64) @ (sig - y)
        want_h = np.einsum("i,ij,ij->j", want_w, A.astype(np.float64),
                           A.astype(np.float64))
        acc = np.sqrt(m) * np.finfo(np.float32).eps * 10
        np.testing.assert_allclose(np.asarray(got_w), want_w,
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_b), want_b,
                                   rtol=2e-5, atol=acc)
        np.testing.assert_allclose(np.asarray(got_h), want_h,
                                   rtol=2e-5, atol=acc)


class TestNarrowNGate:
    """Round-5 measured negative: at n·itemsize < 1024 the (br,1)
    w-block's T(8,128) DMA padding rivals the A tile (207 vs the XLA
    pair's 307 GB/s at 10002432×128 f32) — the kernel must refuse and
    the jnp fallback must carry the op."""

    def test_gate_boundary(self):
        # f32: 128 refused, 256 accepted; bf16: 256 refused, 512 ok;
        # f64: 128 accepted (128·8 = 1024)
        assert not supports_fused_normal_matvec(1 << 20, 128, 4)
        assert supports_fused_normal_matvec(1 << 20, 256, 4)
        assert not supports_fused_normal_matvec(1 << 20, 256, 2)
        assert supports_fused_normal_matvec(1 << 20, 512, 2)
        assert supports_fused_normal_matvec(1 << 20, 128, 8)

    def test_narrow_falls_back_correctly(self):
        from scso_tpu.ops.pallas import counters

        rng = np.random.default_rng(9)
        A = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
        w = jnp.asarray(rng.random(64), jnp.float32)
        v = jnp.asarray(rng.standard_normal(128), jnp.float32)
        counters.reset()
        got = fused_normal_matvec(A, w, v)
        assert counters.KERNEL_HITS["fused_normal_matvec"] == 0
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(A.T @ (w * (A @ v))), rtol=1e-5)
