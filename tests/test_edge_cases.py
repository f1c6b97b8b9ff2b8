"""Edge-case robustness: tiny shapes, degenerate configs, bad inputs."""

import numpy as np
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models import losses


def test_n_equals_one():
    # scalar problem: minimize (x-2)^2 + 0.5|x|. (NOTE: a sharp smoother
    # mu<<1 makes the self-concordant damping microscopic away from 0 —
    # eta ~ lam/sqrt(Hr) explodes — so mu=1 here; the SCORE fixed point
    # sits between the smoothed and composite minimizers.)
    f = lambda x: jnp.sum((x - 2.0) ** 2)
    prob = scso.Problem(np.array([5.0]), f, 0.5, dtype=np.float64)
    sol = scso.iterate(scso.ProxNSCORE(), prob, "l1",
                       scso.PHuberSmootherL1L2(1.0), alpha=1.0,
                       max_epoch=300, verbose=0)
    assert sol.obj[-1] < sol.obj[0]
    assert 1.2 < float(sol.x[0]) < 2.0


def test_m_equals_one_data_problem():
    A = np.array([[1.0, 2.0]])
    y = np.array([1.0])
    prob = scso.Problem(A, y, np.zeros(2), losses.lsq_f, 1e-6,
                        grad_fx=losses.lsq_grad, hess_fx=losses.lsq_hess,
                        dtype=np.float64)
    sol = scso.iterate(scso.ProxNSCORE(solver="cg"), prob, "l1",
                       scso.PHuberSmootherL1L2(0.1), alpha=1.0,
                       max_epoch=300, verbose=0)
    # underdetermined least squares: the data residual must vanish
    assert abs(float((A @ sol.x)[0]) - 1.0) < 1e-2


def test_invalid_reg_name():
    prob = scso.Problem(np.zeros(2), losses.rosenbrock, 1e-8,
                        dtype=np.float64)
    with pytest.raises(ValueError, match="not valid"):
        scso.iterate(scso.ProxNSCORE(), prob, "l3",
                     scso.PHuberSmootherL1L2(1.0), verbose=0)


def test_invalid_ss_type():
    prob = scso.Problem(np.zeros(2), losses.rosenbrock, 1e-8,
                        dtype=np.float64)
    with pytest.raises(ValueError, match="ss_type"):
        scso.iterate(scso.ProxNSCORE(ss_type=7), prob, "l1",
                     scso.PHuberSmootherL1L2(1.0), verbose=0)


def test_gl_without_groups():
    prob = scso.Problem(np.zeros(4), losses.rosenbrock, [1e-3, 1e-2],
                        dtype=np.float64)
    with pytest.raises(ValueError, match="group"):
        scso.iterate(scso.ProxNSCORE(), prob, "gl",
                     scso.PHuberSmootherL1L2(1.0), verbose=0)


def test_indbox_without_bounds():
    prob = scso.Problem(np.zeros(2), losses.rosenbrock, 1e-4,
                        dtype=np.float64)
    with pytest.raises(ValueError, match="lb/ub"):
        scso.iterate(scso.ProxNSCORE(), prob, "indbox",
                     scso.PHuberSmootherIndBox(-1, 1, 0.5), verbose=0)


def test_max_epoch_zero_edge():
    prob = scso.Problem(np.ones(2), losses.rosenbrock, 1e-8,
                        dtype=np.float64)
    sol = scso.iterate(scso.ProxNSCORE(), prob, "l1",
                       scso.PHuberSmootherL1L2(1.0), max_epoch=1,
                       alpha=1.0, verbose=0)
    assert sol.epochs <= 1
    assert len(sol.obj) >= 1


def test_zero_lambda():
    # pure smooth minimization (lam=0): prox degenerates to identity-ish
    prob = scso.Problem(np.array([0.2, -0.5]), losses.rosenbrock, 0.0,
                        dtype=np.float64)
    sol = scso.iterate(scso.ProxNSCORE(), prob, "l2",
                       scso.PHuberSmootherL1L2(1.0), alpha=1.0,
                       max_epoch=500, verbose=0)
    np.testing.assert_allclose(sol.x, [1.0, 1.0], atol=1e-4)


def test_package_exports():
    for name in scso.__all__:
        assert hasattr(scso, name), name


class TestFeaturePadding:
    """make_problem(pad_features=True) zero-pads the feature axis to a
    multiple of 128 so the fused kernels engage at ragged n (the
    north-star n = 10^4 is not a multiple of 128); padded coordinates
    stay exactly 0 and the damping uses the true n."""

    def _pair(self, n=1000, m=256, seed=0):
        from scso_tpu.models import losses, synthetic
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            m, n, density=0.05, n_active=16, seed=seed, dtype=np.float64,
            label01=True)
        kw = dict(grad_fx=losses.logistic01_grad,
                  glm=losses.LOGISTIC01_GLM, dtype=np.float64)
        plain = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2, **kw)
        padded = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                              pad_features=True, **kw)
        return plain, padded

    def test_shapes_and_support(self):
        from scso_tpu.ops.pallas.matvec import supports_fused_normal_matvec
        plain, padded = self._pair(n=1000)
        assert plain.A.shape[1] == 1000
        assert padded.A.shape[1] == 1024 and padded.n_true == 1000
        assert not supports_fused_normal_matvec(*plain.A.shape)
        assert supports_fused_normal_matvec(*padded.A.shape)
        np.testing.assert_array_equal(
            np.asarray(padded.A[:, 1000:]), 0.0)

    def test_padded_solve_matches_unpadded(self):
        plain, padded = self._pair(n=1000)
        sm = scso.PHuberSmootherL1L2(1.0)
        meth = scso.ProxGGNSCORE(solver="cg")
        s_p = scso.iterate(meth, plain, "l1", sm, max_epoch=40, verbose=0)
        s_q = scso.iterate(meth, padded, "l1", sm, max_epoch=40, verbose=0)
        assert s_q.x.shape == (1000,)  # sliced back
        # reduction order differs with padded columns → ~1e-9 f64 drift
        np.testing.assert_allclose(s_q.x, s_p.x, atol=1e-7)
        assert s_q.epochs == s_p.epochs
        np.testing.assert_allclose(s_q.obj, s_p.obj, rtol=1e-8)

    def test_pad_with_sol_and_device_inputs(self):
        """sol is padded alongside x0; jax.Array inputs take the
        on-device concatenate branch and match the host-pad branch."""
        import jax.numpy as jnp
        from scso_tpu.models import losses, synthetic
        A, y, x0, xs = synthetic.make_sparse_logreg_data(
            64, 100, density=0.2, n_active=8, seed=3, dtype=np.float64)
        kw = dict(grad_fx=losses.logistic_grad, dtype=np.float64,
                  pad_features=True)
        p_host = scso.Problem(A, y, x0, losses.logistic_f, 1e-2,
                              sol=xs, **kw)
        p_dev = scso.Problem(jnp.asarray(A), jnp.asarray(y),
                             jnp.asarray(x0), losses.logistic_f, 1e-2,
                             sol=jnp.asarray(xs), **kw)
        for p in (p_host, p_dev):
            assert p.x0.shape == (128,) and p.n_true == 100
            assert p.x_star.shape == (128,)
            np.testing.assert_array_equal(np.asarray(p.x_star[100:]), 0.0)
        np.testing.assert_array_equal(np.asarray(p_host.A),
                                      np.asarray(p_dev.A))
        np.testing.assert_array_equal(np.asarray(p_host.x_star),
                                      np.asarray(p_dev.x_star))

    def test_no_pad_when_already_aligned(self):
        plain, padded = self._pair(n=1024 - 24)  # 1000 → pads
        _, aligned = self._pair(n=1024)
        assert aligned.n_true is None
        assert aligned.A.shape[1] == 1024

    def test_rejects_groups_and_bounds(self):
        from scso_tpu.models import losses
        with pytest.raises(ValueError, match="pad_features"):
            scso.Problem(np.zeros(10), losses.rosenbrock, 0.1,
                         C_set=[-1.0, 1.0], pad_features=True,
                         dtype=np.float64)

    def test_rejects_dataless_problems(self):
        """A generic f(x) sees padded coordinates as real variables and
        silently optimizes over them — only a zero-padded data matrix
        neutralizes the padding, so data-less problems are rejected."""
        from scso_tpu.models import losses
        with pytest.raises(ValueError, match="data problem"):
            scso.Problem(np.zeros(10), losses.rosenbrock, 0.1,
                         pad_features=True, dtype=np.float64)

    def test_aligned_n_is_noop_for_any_problem_kind(self):
        """The guards fire only when padding would occur: at a
        128-aligned n, pad_features is a no-op even for bounded or
        data-less problems (a config that sets pad_features=True
        unconditionally must not break on aligned shapes)."""
        from scso_tpu.models import losses
        p = scso.Problem(np.zeros(128), losses.rosenbrock, 0.1,
                         C_set=[-1.0, 1.0], pad_features=True,
                         dtype=np.float64)
        assert p.n_true is None and p.x0.shape == (128,)

    def test_pallas_kernel_parity_on_padded(self):
        """kernels='pallas' (interpret) on a padded problem matches xla."""
        plain, padded = self._pair(n=600, m=128)
        sm = scso.PHuberSmootherL1L2(1.0)
        kw = dict(max_epoch=25, verbose=0)
        s_x = scso.iterate(scso.ProxGGNSCORE(solver="cg", kernels="xla"),
                           padded, "l1", sm, **kw)
        s_k = scso.iterate(scso.ProxGGNSCORE(solver="cg", kernels="pallas"),
                           padded, "l1", sm, **kw)
        np.testing.assert_allclose(s_k.x, s_x.x, atol=1e-8)
