"""AOT deployment: export the fused solver as StableHLO, serve it.

The artifact must execute without retracing, match the in-process solve
bit-for-bit on its template data, and serve FRESH same-shape data
identically to a fresh solve (nothing data-dependent baked in)."""

import numpy as np
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.utils import export_solver, load_solver, make_serving_fn
from scso_tpu._src.struct import replace as dc_replace


def _prob(seed=1):
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        128, 16, density=0.3, n_active=4, seed=seed, dtype=np.float64)
    return scso.Problem(A, y, x0, losses.logistic_f, 1e-2,
                        grad_fx=losses.logistic_grad,
                        hess_fx=losses.logistic_hess, dtype=np.float64)


SM = lambda: scso.PHuberSmootherL1L2(1.0)
METH = lambda: scso.ProxNSCORE(solver="dense", ss_type=3)


class TestDeploy:
    def test_export_roundtrip_matches_iterate(self):
        prob = _prob()
        blob = export_solver(METH(), prob, "l1", SM())
        assert isinstance(blob, bytes) and len(blob) > 1000
        serve = load_solver(blob)
        x, k, obj = serve(prob.A, prob.y, prob.x0)
        ref = scso.iterate(METH(), prob, "l1", SM(), verbose=0)
        assert int(k) == ref.epochs
        np.testing.assert_allclose(np.asarray(x), ref.x, atol=1e-14)
        np.testing.assert_allclose(float(obj), ref.obj[-1], rtol=1e-14)

    def test_fresh_data_through_artifact(self):
        """Same-shape fresh data: nothing from the template's A/y/x0 may
        be baked into the artifact."""
        import jax.numpy as jnp

        prob = _prob(seed=1)
        blob = export_solver(METH(), prob, "l1", SM())
        serve = load_solver(blob)
        A2, y2, x02, _ = synthetic.make_sparse_logreg_data(
            128, 16, density=0.3, n_active=4, seed=9, dtype=np.float64)
        x2, _, _ = serve(A2, y2, x02)
        ref2 = scso.iterate(METH(), dc_replace(prob, A=jnp.asarray(A2),
                                               y=jnp.asarray(y2),
                                               x0=jnp.asarray(x02)),
                            "l1", SM(), verbose=0)
        np.testing.assert_allclose(np.asarray(x2), ref2.x, atol=1e-14)

    def test_serving_fn_is_jittable(self):
        import jax

        prob = _prob()
        serve = make_serving_fn(METH(), prob, "l1", SM())
        x, k, obj = jax.jit(serve)(prob.A, prob.y, prob.x0)
        ref = scso.iterate(METH(), prob, "l1", SM(), verbose=0)
        np.testing.assert_allclose(np.asarray(x), ref.x, atol=1e-14)

    def test_ggn_cg_exports_too(self):
        """The matrix-free GGN-CG path (the TPU headline) lowers through
        export as well — CG while_loops and all."""
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            128, 16, density=0.3, n_active=4, seed=3, dtype=np.float64,
            label01=True)
        prob = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                            grad_fx=losses.logistic01_grad,
                            glm=losses.LOGISTIC01_GLM, dtype=np.float64)
        meth = scso.ProxGGNSCORE(solver="cg")
        blob = export_solver(meth, prob, "l1", SM())
        serve = load_solver(blob)
        x, k, obj = serve(prob.A, prob.y, prob.x0)
        ref = scso.iterate(meth, prob, "l1", SM(), verbose=0)
        np.testing.assert_allclose(np.asarray(x), ref.x, atol=1e-14)

    def test_requires_data_problem(self):
        p = scso.Problem(np.zeros(4), losses.rosenbrock, 1e-3,
                         dtype=np.float64)
        with pytest.raises(ValueError, match="data problem"):
            export_solver(METH(), p, "l1", SM())
