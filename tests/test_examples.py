"""Smoke-run every example script (they mirror the reference README)."""

import importlib
import sys
from pathlib import Path

import numpy as np

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"
sys.path.insert(0, str(EXAMPLES))


def run(name):
    mod = importlib.import_module(name)
    return mod.main()


def test_rosenbrock():
    sol = run("01_rosenbrock_l1")
    np.testing.assert_allclose(sol.x, [1.0, 1.0], atol=1e-3)


def test_sparse_logistic():
    sol = run("02_sparse_logistic")
    assert sol.obj[-1] <= sol.obj[0]


def test_group_lasso():
    sol = run("03_group_lasso")
    assert float(sol.rel[-1]) < 0.5


def test_box_qp():
    sol = run("04_box_qp")
    assert np.all(np.abs(sol.x) <= 1 + 1e-9)


def test_scaleout():
    res = run("05_scaleout")
    assert res.batch_size == 8
    assert np.all(np.isfinite(res.obj))


def test_checkpoint_profile():
    sol = run("06_checkpoint_profile")
    assert sol.obj[-1] <= sol.obj[0]


def test_poisson():
    sol = run("07_poisson")
    assert sol.obj[-1] <= sol.obj[0]
    # l1 at this lambda must actually sparsify (192 features, ~30 kept)
    assert int((np.abs(sol.x) > 1e-4).sum()) < 60


def test_multinomial():
    sol = run("08_multinomial")
    assert sol.obj[-1] <= sol.obj[0]


def test_federated():
    sol = run("09_federated")
    assert np.all(np.isfinite(sol.x))


def test_continuation():
    sol = run("10_continuation")
    assert np.all(np.isfinite(sol.x))
    assert sol.obj[-1] <= sol.obj[0]


def test_outofcore_bigrows():
    sol = run("11_outofcore_bigrows")
    assert np.all(np.isfinite(sol.x))
    assert sol.obj[-1] <= sol.obj[0]
