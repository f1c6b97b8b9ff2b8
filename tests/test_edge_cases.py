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
