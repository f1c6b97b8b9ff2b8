"""Native (C++) data-generation tier tests.

Skipped when the toolchain is unavailable (the package must work without
it — every native entry point has a numpy fallback).
"""

import numpy as np
import pytest

from scso_tpu import _native

pytestmark = pytest.mark.skipif(not _native.available(),
                                reason="native toolchain unavailable")


def test_sparse_logreg_structure():
    m, n = 2048, 256
    A, y, x0, x_true = _native.sparse_logreg(m, n, 0.05, 16, 3, True)
    assert A.shape == (m, n) and y.shape == (m,)
    nnz = (A != 0).mean()
    assert 0.03 < nnz < 0.06  # ~density (collisions reduce it slightly)
    assert set(np.unique(y)) <= {0.0, 1.0}
    assert (x_true != 0).sum() <= 16
    vals = A[A != 0]
    assert abs(vals.mean()) < 0.05 and abs(vals.std() - 1.0) < 0.05


def test_deterministic():
    a = _native.sparse_logreg(512, 64, 0.1, 8, 9, False)
    b = _native.sparse_logreg(512, 64, 0.1, 8, 9, False)
    for x, z in zip(a, b):
        np.testing.assert_array_equal(x, z)
    assert set(np.unique(a[1])) <= {-1.0, 1.0}


def test_randn_moments():
    A = _native.randn(4096, 128, 5)
    assert abs(A.mean()) < 0.01
    assert abs(A.std() - 1.0) < 0.01


def test_synthetic_backend_native():
    from scso_tpu.models import synthetic

    A, y, x0, xt = synthetic.make_sparse_logreg_data(
        256, 64, density=0.1, n_active=8, seed=1, backend="native")
    assert A.dtype == np.float32 and A.shape == (256, 64)


def test_solver_runs_on_native_data():
    import scso_tpu as scso
    from scso_tpu.models import losses, synthetic

    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        512, 64, density=0.1, n_active=8, seed=2, label01=True,
        backend="native", dtype=np.float64)
    prob = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                        grad_fx=losses.logistic01_grad, dtype=np.float64)
    sol = scso.iterate(scso.ProxLQNSCORE(), prob, "l1",
                       scso.PHuberSmootherL1L2(1.0), max_epoch=100,
                       verbose=0)
    assert sol.obj[-1] < sol.obj[0]
