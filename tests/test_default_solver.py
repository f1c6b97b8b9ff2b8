"""The no-knob solver IS the benchmarked solver (round-2 verdict Weak #1).

Round 2 shipped `ProxGGNSCORE()` defaulting to a fixed over-tight CG
tolerance (1e-8) — exactly the configuration behind round 1's 720-epoch
stall — while the headline bench hand-picked cg_tol=3e-4. Since round 3
the defaults are the MEASURED-BEST bench config: `cg_tol=0.0` (AUTO =
sqrt(eps(dtype)): ~3.4e-4 in f32, the measured forcing knee; ~1.5e-8 in
f64), `greedy_alpha=True` for the Newton-quality methods (41 vs 120
epochs at the north-star shape), and `cg_adaptive=False` (EW forcing
measured to negate the greedy gains at scale — docs/STATUS.md). These
tests pin that contract: a user calling the documented API with no
knobs must converge like the bench, not many times slower.
"""

import numpy as np
import pytest

import scso_tpu as scso
from scso_tpu.algorithms.steps import _cg_tol

from test_greedy_alpha import _gap_anchor, _mid_logreg


class TestAutoTol:
    def test_auto_tol_values(self):
        m = scso.ProxGGNSCORE()
        # f32: EXACTLY the measured knee (sqrt(eps)=3.45e-4 measured to
        # creep at the 1e-6 endgame — .bench_r3 logs / docs/STATUS.md)
        assert _cg_tol(m, np.float32) == 3e-4
        assert np.isclose(_cg_tol(m, np.float64),
                          float(np.finfo(np.float64).eps) ** 0.5)

    def test_explicit_tol_respected_and_floored(self):
        m = scso.ProxGGNSCORE(cg_tol=3e-4)
        assert _cg_tol(m, np.float32) == 3e-4
        # explicit but unresolvable in f32: floored at 4*eps
        m = scso.ProxGGNSCORE(cg_tol=1e-12)
        assert np.isclose(_cg_tol(m, np.float32),
                          4.0 * float(np.finfo(np.float32).eps))

    def test_measured_best_defaults(self):
        """The no-knob config IS the benchmarked config: greedy SCORE
        damping auto-on (ss_type=1), fixed AUTO forcing (EW adaptive
        measured 120 vs 41 epochs at the north-star shape —
        docs/STATUS.md round 3)."""
        from scso_tpu.algorithms.steps import use_greedy

        for m in (scso.ProxGGNSCORE(), scso.ProxNSCORE()):
            # AUTO: on for ss_type=1 at large n (the measured-win regime)
            assert use_greedy(m, 10000)
            assert not m.cg_adaptive
            assert m.cg_tol == 0.0         # AUTO forcing knee
        # AUTO turns greedy OFF for ss_type 2/3 (Armijo can freeze at
        # the l1 kinks the full prox step lands on) and at small n
        # (the trial's extra data pass measured to cost more than the
        # damping over-throttling it fixes) …
        assert not use_greedy(scso.ProxNSCORE(ss_type=3), 10000)
        assert not use_greedy(scso.ProxGGNSCORE(ss_type=2), 10000)
        assert not use_greedy(scso.ProxGGNSCORE(), 1024)
        # … but an explicit setting always wins
        assert use_greedy(scso.ProxNSCORE(ss_type=3, greedy_alpha=True),
                          8)
        assert use_greedy(scso.ProxGGNSCORE(greedy_alpha=True), 1024)
        assert not use_greedy(scso.ProxNSCORE(greedy_alpha=False), 10000)
        # L-BFGS directions are not Newton-quality; greedy stays opt-in
        assert not use_greedy(scso.ProxLQNSCORE(), 10000)


class TestNoKnobMatchesBench:
    def test_default_ggn_cg_within_1p5x_of_tuned(self):
        """Default ProxGGNSCORE(solver='cg') reaches the 1e-6 gap within
        1.5x the epochs of the round-2 hand-tuned bench configuration
        (cg_tol=3e-4, fixed forcing) on a bench-family f32 sparse
        logistic regression."""
        sm = scso.PHuberSmootherL1L2(1.0)
        anchor_m = scso.ProxGGNSCORE(solver="cg", cg_tol=1e-6,
                                     cg_adaptive=False, cg_maxiter=300,
                                     greedy_alpha=False)
        tuned = scso.ProxGGNSCORE(solver="cg", cg_tol=3e-4,
                                  cg_adaptive=False, cg_maxiter=100,
                                  greedy_alpha=False)
        default = scso.ProxGGNSCORE(solver="cg")
        prob = _gap_anchor(_mid_logreg(dtype=np.float32), anchor_m, sm,
                           alpha=1.0)
        kw = dict(x_tol=1e-14, f_tol=1e-6, max_epoch=400, verbose=0,
                  alpha=1.0)
        s_tuned = scso.iterate(tuned, prob, "l1", sm, **kw)
        s_def = scso.iterate(default, prob, "l1", sm, **kw)

        def reached(s):
            # the stop test uses the PRE-step gap (reference parity:
            # stats at epoch top, iterate.jl:189-259), so the final
            # post-step record can overshoot — check the history
            return (s.epochs < kw["max_epoch"]
                    and float(np.min(np.asarray(s.objrel))) <= 1e-6 * 1.01)

        assert reached(s_tuned)
        assert reached(s_def)
        assert s_def.epochs <= 1.5 * s_tuned.epochs + 2
        # ...and spends no more CG iterations than the fixed forcing
        assert (s_def.cg_info["total_cg_iters"]
                <= s_tuned.cg_info["total_cg_iters"])

    def test_static_precond_same_solution(self):
        """static_precond changes ONLY the CG preconditioner quality:
        the solve must land on the same solution as the exact per-epoch
        Jacobi diagonal."""
        from scso_tpu._src.struct import replace as dc_replace

        sm = scso.PHuberSmootherL1L2(1.0)
        prob = scso.with_col_sumsq(_mid_logreg(m=512, n=128,
                                               dtype=np.float64))
        kw = dict(x_tol=1e-12, f_tol=0.0, max_epoch=120, verbose=0,
                  alpha=1.0)
        m_dyn = scso.ProxGGNSCORE(solver="cg", cg_tol=1e-10)
        m_sta = dc_replace(m_dyn, static_precond=True)
        s_dyn = scso.iterate(m_dyn, prob, "l1", sm, **kw)
        s_sta = scso.iterate(m_sta, prob, "l1", sm, **kw)
        np.testing.assert_allclose(np.asarray(s_sta.x),
                                   np.asarray(s_dyn.x), atol=1e-8)
        # without col_sumsq attached, the flag is ignored (dynamic path)
        s_no = scso.iterate(m_sta, _mid_logreg(m=512, n=128,
                                               dtype=np.float64),
                            "l1", sm, **kw)
        np.testing.assert_array_equal(np.asarray(s_no.x),
                                      np.asarray(s_dyn.x))

    def test_with_col_sumsq_validation(self):
        import jax.numpy as jnp2
        prob = scso.with_col_sumsq(_mid_logreg(m=64, n=32,
                                               dtype=np.float64))
        np.testing.assert_allclose(
            np.asarray(prob.col_sumsq),
            np.asarray(jnp2.sum(prob.A * prob.A, axis=0)), rtol=1e-12)
        with pytest.raises(ValueError, match="data problem"):
            scso.with_col_sumsq(scso.Problem(
                np.zeros(2), lambda x: (x ** 2).sum(), 1e-3,
                dtype=np.float64))

    def test_default_newton_cg_converges_oracle(self):
        """No-knob Newton-CG still passes the reference oracle regime
        (f64 — the auto floor lands at ~1.5e-8, the old tight default)."""
        sm = scso.PHuberSmootherL1L2(1.0)
        prob = _mid_logreg(m=512, n=128, dtype=np.float64)
        s = scso.iterate(scso.ProxNSCORE(solver="cg"), prob, "l1", sm,
                         x_tol=1e-12, f_tol=0.0, max_epoch=200, verbose=0)
        s2 = scso.iterate(scso.ProxNSCORE(solver="dense"), prob, "l1", sm,
                          x_tol=1e-12, f_tol=0.0, max_epoch=200, verbose=0)
        np.testing.assert_allclose(np.asarray(s.x), np.asarray(s2.x),
                                   rtol=0, atol=1e-6)

    def test_default_matches_explicit_equivalent(self):
        """cg_tol=0.0 (auto) solves identically to the explicit value —
        the sentinel is pure sugar."""
        sm = scso.PHuberSmootherL1L2(1.0)
        prob = _mid_logreg(m=512, n=128, dtype=np.float64)
        tol = float(np.finfo(np.float64).eps) ** 0.5
        kw = dict(x_tol=0.0, f_tol=0.0, max_epoch=15, verbose=0)
        s_auto = scso.iterate(scso.ProxGGNSCORE(solver="cg"), prob, "l1",
                              sm, **kw)
        s_expl = scso.iterate(scso.ProxGGNSCORE(solver="cg", cg_tol=tol),
                              prob, "l1", sm, **kw)
        np.testing.assert_array_equal(np.asarray(s_auto.x),
                                      np.asarray(s_expl.x))


class TestRound4AdviceFixes:
    """Regression tests for the round-3 advisor findings (ADVICE.md r3)."""

    def test_mglm_only_auto_resolves_cg(self):
        """An mglm-only problem (no out_fn/loss_fn/jac pieces) under
        solver='auto' must route to the matrix-free CG path even below
        the dense size budget — the dense branch would fail inside
        prob.ggn_pieces ('requires out_fn/loss_fn')."""
        from test_multioutput import make_mglm_problem
        from scso_tpu._src.struct import replace as dc_replace
        from scso_tpu.algorithms.steps import _resolve_ggn_solver

        prob = dc_replace(make_mglm_problem(), out_fn=None, loss_fn=None)
        meth = scso.ProxGGNSCORE()  # solver='auto'
        assert _resolve_ggn_solver(meth, prob, prob.A, prob.x0) == "cg"
        # ...and the solve actually runs end-to-end
        sm = scso.PHuberSmootherL1L2(1.0)
        s = scso.iterate(meth, prob, "l1", sm, max_epoch=10, verbose=0)
        assert np.all(np.isfinite(s.x)) and s.obj[-1] < s.obj[0]
        # dense pieces present: the size budget decides as before
        probd = make_mglm_problem()
        assert _resolve_ggn_solver(meth, probd, probd.A, probd.x0) == "auto"

    def test_greedy_auto_requires_cheap_trial(self):
        """AUTO greedy only engages when the glm/mglm spec prices the
        trial via loss_z; the generic f_val fallback costs TWO extra
        full data passes per epoch, so AUTO stays off there."""
        from scso_tpu._src.struct import replace as dc_replace
        from scso_tpu.algorithms.steps import use_greedy

        meth = scso.ProxGGNSCORE()  # greedy_alpha=None = AUTO
        prob = _mid_logreg(m=64, n=32, dtype=np.float64)
        assert use_greedy(meth, 10000, prob)
        prob_no_lz = dc_replace(prob, glm=prob.glm._replace(loss_z=None))
        assert not use_greedy(meth, 10000, prob_no_lz)
        # explicit True still opts in regardless
        assert use_greedy(dc_replace(meth, greedy_alpha=True),
                          10000, prob_no_lz)
        # prob omitted (display/back-compat callers): size rule only
        assert use_greedy(meth, 10000)

    def test_static_precond_skips_row_subsets(self):
        """static_precond composed with curvature_rows: col_sumsq was
        computed over ALL rows, so the subsampled CG system must fall
        back to the exact per-epoch diagonal (preconditioner-quality
        guard) — the solve still lands on the full-data solution of the
        same subsampled operator."""
        from scso_tpu._src.struct import replace as dc_replace

        sm = scso.PHuberSmootherL1L2(1.0)
        prob = scso.with_col_sumsq(_mid_logreg(m=512, n=64,
                                               dtype=np.float64))
        kw = dict(x_tol=1e-12, f_tol=0.0, max_epoch=80, verbose=0,
                  alpha=1.0)
        m_sub = scso.ProxGGNSCORE(solver="cg", cg_tol=1e-10,
                                  curvature_rows=256)
        m_both = dc_replace(m_sub, static_precond=True)
        s_sub = scso.iterate(m_sub, prob, "l1", sm, **kw)
        s_both = scso.iterate(m_both, prob, "l1", sm, **kw)
        # the guard makes the flags equivalent on the subsampled system
        np.testing.assert_allclose(np.asarray(s_both.x),
                                   np.asarray(s_sub.x), atol=1e-10)
