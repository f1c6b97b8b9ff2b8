"""Smoother unit + property tests.

Constants parity with /root/reference/test/test_smooth.jl, plus property
tests the reference lacks (SURVEY.md §4): each smoother's grad/hess_diag
must match jax.grad / jax.hessian of its value wherever the value is the
actual generating function.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.ops import smoothers as sm


MU = 1.0
LB, UB = -1.0, 1.0


class TestConstants:
    # parity: test/test_smooth.jl:5-21
    def test_phuber_l1l2(self):
        h = scso.PHuberSmootherL1L2(MU)
        assert h.Mh == 2.0
        assert h.nu == 2.6

    def test_phuber_indbox(self):
        h = scso.PHuberSmootherIndBox(LB, UB, MU)
        assert h.Mh == 2.0
        assert h.nu == 2.6

    def test_osba_l1(self):
        h = scso.OsBaSmootherL1L2(MU)
        assert h.Mh == 2 * np.sqrt(2)
        assert h.nu == 3.0

    def test_exp_indbox(self):
        h = scso.ExponentialSmootherIndBox(LB, UB, MU)
        assert h.Mh == 1.0 and h.nu == 2.0

    def test_logexp_indbox(self):
        h = scso.LogExpSmootherIndBox(LB, UB, MU)
        assert h.Mh == 1.0 and h.nu == 2.0


def _check_derivatives(h, xs, atol=1e-8):
    """grad == d(val)/dx and hess_diag == d²(val)/dx² elementwise."""
    val = lambda x: jnp.sum(h.val(x))
    g_ad = jax.grad(val)(xs)
    g = h.grad(xs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=atol)
    hd_ad = jax.grad(lambda x: jnp.sum(h.grad(x)))(xs)  # diag since elementwise
    hd = h.hess_diag(xs)
    np.testing.assert_allclose(np.asarray(hd), np.asarray(hd_ad), atol=atol)


class TestDerivativeConsistency:
    def test_phuber(self):
        xs = jnp.asarray([-3.0, -0.5, 0.0, 0.2, 2.0, 10.0])
        _check_derivatives(scso.PHuberSmootherL1L2(MU), xs)

    def test_phuber_closed_form(self):
        # val equals sqrt(mu^2+x^2) - mu, the literal reference expression
        xs = jnp.linspace(-5, 5, 11)
        ref = (MU**2 - MU * jnp.sqrt(MU**2 + xs**2) + xs**2) / jnp.sqrt(
            MU**2 + xs**2
        )
        np.testing.assert_allclose(
            np.asarray(sm.phuber_val(xs, MU)), np.asarray(ref), atol=1e-12
        )

    def test_osba(self):
        xs = jnp.asarray([-3.0, -0.5, 0.3, 2.0, 10.0])
        _check_derivatives(scso.OsBaSmootherL1L2(MU), xs, atol=1e-7)

    def test_osba_at_zero(self):
        h = scso.OsBaSmootherL1L2(MU)
        x = jnp.asarray([0.0])
        assert np.isfinite(float(h.val(x)[0]))
        assert float(h.val(x)[0]) == pytest.approx(0.0, abs=1e-12)
        assert float(h.grad(x)[0]) == pytest.approx(0.0, abs=1e-12)
        assert float(h.hess_diag(x)[0]) == pytest.approx(1.0 / MU, rel=1e-6)

    def test_phuber_indbox_outside(self):
        h = scso.PHuberSmootherIndBox(LB, UB, MU)
        xs = jnp.asarray([-5.0, -2.0, 1.5, 4.0])  # strictly outside the box
        _check_derivatives(h, xs)

    def test_phuber_indbox_inside(self):
        h = scso.PHuberSmootherIndBox(LB, UB, MU)
        xs = jnp.asarray([-0.9, 0.0, 0.5])
        eps = float(jnp.finfo(xs.dtype).eps)
        np.testing.assert_allclose(np.asarray(h.val(xs)), eps)
        np.testing.assert_allclose(np.asarray(h.grad(xs)), 0.0)
        np.testing.assert_allclose(np.asarray(h.hess_diag(xs)), eps)

    def test_exponential_indbox(self):
        h = scso.ExponentialSmootherIndBox(LB, UB, MU)
        xs = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])
        _check_derivatives(h, xs)

    def test_logexp_grad_is_val_derivative_in_quad_region(self):
        h = scso.LogExpSmootherIndBox(LB, UB, 0.3)
        # quadratic margin regions (inside the box, near the bounds)
        xs = jnp.asarray([-0.95, -0.8, 0.8, 0.95])
        val = lambda x: jnp.sum(h.val(x))
        g_ad = jax.grad(val)(xs)
        np.testing.assert_allclose(
            np.asarray(h.grad(xs)), np.asarray(g_ad), atol=1e-8
        )

    def test_nosmooth(self):
        h = scso.NoSmooth(1.0)
        xs = jnp.asarray([1.0, -2.0])
        assert float(jnp.sum(h.val(xs))) == 0.0
        assert float(jnp.sum(h.grad(xs))) == 0.0
        assert (np.asarray(h.hess_diag(xs)) > 0).all()


class TestMg:
    def test_formula_nu_le_3(self):
        # n^((3-nu)/2) * mu^(nu/2-2) * Mh  (smoothing.jl:12-26)
        assert scso.get_Mg(2.0, 2.6, 1.0, 100) == pytest.approx(
            100 ** 0.2 * 2.0
        )
        assert scso.get_Mg(1.0, 2.0, 0.5, 10) == pytest.approx(
            10 ** 0.5 * 0.5 ** -1.0
        )

    def test_formula_nu_gt_3(self):
        assert scso.get_Mg(1.0, 4.0, 2.0, 7) == pytest.approx(2.0 ** -2.0)

    def test_validation(self):
        with pytest.raises(ValueError):
            scso.get_Mg(-1.0, 2.0, 1.0, 5)
        with pytest.raises(ValueError):
            scso.get_Mg(1.0, 2.0, -1.0, 5)
        with pytest.raises(ValueError):
            scso.get_Mg(1.0, -2.0, 1.0, 5)


class TestBounds:
    def test_inf_caching(self):
        a, b = scso.sanitize_bounds(-np.inf, np.inf, 3)
        np.testing.assert_allclose(a, -1e32)
        np.testing.assert_allclose(b, 1e32)

    def test_length_mismatch(self):
        with pytest.raises(ValueError):
            scso.sanitize_bounds([0.0, 1.0], [2.0], 5)


class TestVmapOverMu:
    def test_smoother_vmaps(self):
        """mu is a traced leaf: a μ-sweep vmaps over the smoother pytree."""
        xs = jnp.asarray([-1.0, 0.5, 2.0])
        mus = jnp.asarray([0.1, 1.0, 10.0])

        def grad_at(mu):
            return sm.PHuberSmootherL1L2(mu=mu).grad(xs)

        out = jax.vmap(grad_at)(mus)
        expect = jnp.stack([grad_at(m) for m in mus])
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect))


class TestADProperties:
    """Systematic property tests: grad/hess_diag must match jax.grad /
    jax.hessian of the smoother value wherever the value is smooth
    (SURVEY.md §4 'property tests that smoother grad/hess match jax.grad')."""

    def _check(self, sm, x, atol=1e-9, check_hess=True):
        import jax
        val = lambda v: jnp.sum(sm.val(v))
        g_ad = jax.grad(val)(x)
        np.testing.assert_allclose(np.asarray(sm.grad(x)), np.asarray(g_ad),
                                   atol=atol)
        if check_hess:
            h_ad = jnp.diagonal(jax.hessian(val)(x))
            np.testing.assert_allclose(np.asarray(sm.hess_diag(x)),
                                       np.asarray(h_ad), atol=atol)

    def test_phuber_l1l2(self):
        import scso_tpu as scso
        x = jnp.asarray(np.random.default_rng(0).standard_normal(64))
        self._check(scso.PHuberSmootherL1L2(0.7), x)

    def test_osba_l1l2(self):
        import scso_tpu as scso
        rng = np.random.default_rng(1)
        x = jnp.asarray(np.sign(rng.standard_normal(64))
                        * (0.1 + np.abs(rng.standard_normal(64))))
        self._check(scso.OsBaSmootherL1L2(0.5), x, atol=1e-8)

    def test_exponential_indbox(self):
        import scso_tpu as scso
        x = jnp.asarray(np.random.default_rng(2).standard_normal(64))
        self._check(scso.ExponentialSmootherIndBox(-1.0, 1.0, 0.6), x)

    def test_phuber_indbox_outside(self):
        import scso_tpu as scso
        # strictly outside the box on both sides (smooth branches)
        x = jnp.concatenate([jnp.linspace(-3.0, -1.1, 16),
                             jnp.linspace(1.1, 3.0, 16)])
        sm = scso.PHuberSmootherIndBox(-1.0, 1.0, 0.6)
        # value/grad match AD on the smooth branches
        self._check(sm, x, check_hess=True)

    def test_logexp_indbox_smooth_regions(self):
        import scso_tpu as scso
        sm = scso.LogExpSmootherIndBox(-1.0, 1.0, 0.3)
        # below-barrier region (x < a) and quadratic margin (a < x < a+mu)
        x = jnp.concatenate([jnp.linspace(-2.0, -1.05, 8),
                             jnp.linspace(-0.95, -0.75, 8)])
        import jax
        val = lambda v: jnp.sum(sm.val(v))
        g_ad = jax.grad(val)(x)
        np.testing.assert_allclose(np.asarray(sm.grad(x)),
                                   np.asarray(g_ad), atol=1e-8)

    def test_gl_infconv_value_finite(self):
        import scso_tpu as scso
        from scso_tpu.ops.groups import make_contiguous_groups
        from scso_tpu.ops import smoothers as sms
        groups = make_contiguous_groups(12, 4)
        sm = sms.PHuberSmootherGL(mu=0.5, lam1=0.01, lam2=0.1,
                                  groups=groups)
        x = jnp.asarray(np.random.default_rng(3).standard_normal(12))
        assert np.all(np.isfinite(np.asarray(sm.val(x))))
        assert np.all(np.isfinite(np.asarray(sm.grad(x))))
        assert np.all(np.isfinite(np.asarray(sm.hess_diag(x))))
