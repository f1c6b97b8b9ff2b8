"""Greedy SCORE damping (methods' ``greedy_alpha``).

The greedy variant trials the undamped prox step and accepts on strict
composite-objective decrease, falling back to the reference-damped step —
so it must (a) reach the same fixed points as the damped solver, (b) never
need MORE epochs on problems where damping over-throttles, and (c) be
NaN-safe when the full step diverges the objective.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu._src.struct import replace as dc_replace

from test_algs import MU, f_reg_y, Mfunc, make_log_problem, check


@pytest.mark.parametrize("reg_name", ["l1", "l2"])
class TestGreedyOracles:
    """The reference oracle fixtures still converge with greedy_alpha on
    (same fixed point; only the path differs)."""

    def test_newton(self, reg_name):
        sol = scso.iterate(scso.ProxNSCORE(greedy_alpha=True),
                           make_log_problem(), reg_name,
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        check(sol)

    def test_ggn(self, reg_name):
        model = make_log_problem(out_fn=Mfunc, loss_fn=f_reg_y)
        sol = scso.iterate(scso.ProxGGNSCORE(greedy_alpha=True), model,
                           reg_name, scso.PHuberSmootherL1L2(MU), verbose=0)
        check(sol)

    def test_lbfgs(self, reg_name):
        sol = scso.iterate(scso.ProxLQNSCORE(greedy_alpha=True),
                           make_log_problem(), reg_name,
                           scso.PHuberSmootherL1L2(MU), verbose=0)
        check(sol)


def _mid_logreg(m=2048, n=512, dtype=np.float32):
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.05, n_active=32, seed=3, dtype=dtype, label01=True)
    return scso.Problem(
        A, y, x0, losses.logistic01_f, 0.01,
        grad_fx=losses.logistic01_grad,
        glm=losses.LOGISTIC01_GLM,
        out_fn=losses.sigmoid_out,
        loss_fn=losses.logistic_loss_01,
        dtype=dtype,
    )


def _gap_anchor(prob, method, sm, **kw):
    """Presolve to a fixed point and return the problem re-anchored on it."""
    cur = prob
    for _ in range(3):
        s = scso.iterate(method, cur, "l1", sm, x_tol=1e-12, f_tol=0.0,
                         max_epoch=400, verbose=0, **kw)
        cur = dc_replace(cur, x0=s.state.x)
    return dc_replace(prob, x_star=jnp.asarray(s.state.x))


class TestGreedyAccelerates:
    def test_fewer_epochs_and_same_gap(self):
        """On a mid-size sparse logistic regression the greedy variant
        reaches the 1e-6 gap in at most the damped epoch count (measured:
        ~2x fewer at n >= 10^4 — benchmarks/diag_epochs.py)."""
        sm = scso.PHuberSmootherL1L2(1.0)
        damped = scso.ProxGGNSCORE(solver="cg", cg_tol=3e-4,
                                   cg_adaptive=False, cg_maxiter=100)
        greedy = dc_replace(damped, greedy_alpha=True)
        prob = _gap_anchor(_mid_logreg(), greedy, sm, alpha=1.0)
        kw = dict(x_tol=1e-14, f_tol=1e-6, max_epoch=400, verbose=0,
                  alpha=1.0)
        s_damped = scso.iterate(damped, prob, "l1", sm, **kw)
        s_greedy = scso.iterate(greedy, prob, "l1", sm, **kw)
        assert float(s_greedy.objrel[-1]) <= 1e-6
        assert s_greedy.epochs <= s_damped.epochs

    def test_glm_loss_z_matches_f_val_path(self):
        """The GLM loss_z trial objective and the generic f_val fallback
        must make the same accept/reject decisions — identical solves."""
        sm = scso.PHuberSmootherL1L2(1.0)
        greedy = scso.ProxGGNSCORE(solver="cg", cg_tol=3e-4,
                                   cg_maxiter=100, greedy_alpha=True)
        prob = _mid_logreg(m=512, n=128, dtype=np.float64)
        # strip loss_z: forces the f_val fallback inside the greedy trial
        glm_no_lz = prob.glm._replace(loss_z=None)
        prob_no_lz = dc_replace(prob, glm=glm_no_lz)
        kw = dict(x_tol=1e-12, f_tol=0.0, max_epoch=60, verbose=0, alpha=1.0)
        s_lz = scso.iterate(greedy, prob, "l1", sm, **kw)
        s_fv = scso.iterate(greedy, prob_no_lz, "l1", sm, **kw)
        np.testing.assert_allclose(np.asarray(s_lz.x), np.asarray(s_fv.x),
                                   rtol=1e-10, atol=1e-12)

    def test_nan_trial_falls_back_to_damped(self):
        """A full step that explodes the objective (Poisson exp overflow)
        must be rejected — the greedy solve matches the damped solve's
        step exactly when every trial is rejected."""
        rng = np.random.default_rng(0)
        m, n = 64, 8
        A = rng.normal(size=(m, n)) * 3.0
        xt = rng.normal(size=n) * 2.0
        y = rng.poisson(np.exp(np.clip(A @ xt, -20, 20))).astype(np.float64)
        x0 = np.zeros(n) + 5.0  # huge z on the trial step
        prob = scso.Problem(A, y, x0, losses.poisson_f, 0.1,
                            grad_fx=losses.poisson_grad,
                            glm=losses.POISSON_GLM, dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(1.0)
        damped = scso.ProxNSCORE(solver="cg", cg_tol=1e-10)
        greedy = dc_replace(damped, greedy_alpha=True)
        kw = dict(x_tol=1e-12, f_tol=0.0, max_epoch=3, verbose=0)
        s_d = scso.iterate(damped, prob, "l1", sm, **kw)
        s_g = scso.iterate(greedy, prob, "l1", sm, **kw)
        # both runs stay finite; greedy never does worse than damped
        assert np.isfinite(np.asarray(s_g.x)).all()
        assert float(s_g.obj[-1]) <= float(s_d.obj[-1]) * (1 + 1e-12)

    def test_generic_problem_f_val_path(self):
        """greedy_alpha on a data-less generic problem (convex quadratic
        + l1) routes through prob.f_val and still converges."""
        b = np.array([2.0, -3.0, 0.0, 1.5])
        fq = lambda x: 0.5 * jnp.sum((x - b) ** 2)
        # gentle lam/mu: the scaled prox's variable-metric threshold
        # lam*ss/Hr grows as Hr -> 0 away from the origin, so a sharp
        # smoother would stall ANY variant (damped included) on a
        # solution this far from 0 — the test targets the f_val greedy
        # path, not that quirk
        prob = scso.Problem(np.zeros(4), fq, 0.01, dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(2.0)
        sol = scso.iterate(scso.ProxNSCORE(greedy_alpha=True, solver="dense"),
                           prob, "l1", sm, x_tol=1e-12, f_tol=0.0,
                           max_epoch=200, verbose=0)
        x = np.asarray(sol.x)
        # near the soft-threshold optimum of 0.5||x-b||^2 + 0.01||x||_1
        expect = np.sign(b) * np.maximum(np.abs(b) - 0.01, 0.0)
        np.testing.assert_allclose(x, expect, atol=0.15)
        assert float(sol.obj[-1]) < float(sol.obj[0])

    def test_resume_bitmatch_with_greedy(self):
        """Interrupted + resumed greedy solves bit-match uninterrupted
        ones (the greedy path adds no carried state)."""
        sm = scso.PHuberSmootherL1L2(1.0)
        greedy = scso.ProxGGNSCORE(solver="cg", cg_tol=3e-4,
                                   cg_maxiter=50, greedy_alpha=True)
        prob = _mid_logreg(m=512, n=128, dtype=np.float64)
        full = scso.iterate(greedy, prob, "l1", sm, x_tol=0.0, f_tol=0.0,
                            max_epoch=20, verbose=0)
        part = scso.iterate(greedy, prob, "l1", sm, x_tol=0.0, f_tol=0.0,
                            max_epoch=8, verbose=0)
        rest = scso.iterate(greedy, prob, "l1", sm, x_tol=0.0, f_tol=0.0,
                            max_epoch=20, verbose=0,
                            resume_state=part.state)
        np.testing.assert_array_equal(np.asarray(full.x), np.asarray(rest.x))
