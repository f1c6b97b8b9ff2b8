"""Federated solve: local SCORE epochs + weighted model averaging.

Gives the reference's stored-unused federated knobs (comm_rounds,
local_max_iter — iterate.jl:45,124-127) a real mechanism and tests its
honest contract: monotone-ish centralized progress to within a few
percent of the centralized optimum (the averaging fixed point), exact
recovery when handed to the row-sharded solve, and weighted averaging
semantics.
"""

import numpy as np
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.parallel import (
    federated_solve,
    make_mesh,
    shard_problem,
    split_clients,
)


def _prob(m=512, n=24, seed=11):
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.25, n_active=6, seed=seed, dtype=np.float64)
    return scso.Problem(A, y, x0, losses.logistic_f, 1e-2,
                        grad_fx=losses.logistic_grad,
                        hess_fx=losses.logistic_hess, dtype=np.float64)


METH = lambda: scso.ProxNSCORE(solver="dense", ss_type=3)
SM = lambda: scso.PHuberSmootherL1L2(1.0)


class TestSplitClients:
    def test_shapes_and_content(self):
        prob = _prob()
        cl = split_clients(prob, 8)
        assert cl.A.shape == (8, 64, 24) and cl.y.shape == (8, 64)
        np.testing.assert_array_equal(
            np.asarray(cl.A).reshape(512, 24), np.asarray(prob.A))
        assert cl.x0.shape == (8, 24)

    def test_refuses_ragged_split(self):
        prob = _prob(m=510)
        with pytest.raises(ValueError, match="divisible"):
            split_clients(prob, 8)

    def test_requires_data(self):
        p = scso.Problem(np.zeros(4), losses.rosenbrock, 1e-3,
                         dtype=np.float64)
        with pytest.raises(ValueError, match="data problem"):
            split_clients(p, 2)


class TestFederatedSolve:
    def test_converges_near_centralized(self):
        prob = _prob()
        central = scso.iterate(METH(), prob, "l1", SM(), max_epoch=200,
                               verbose=0)
        fed = federated_solve(METH(), prob, "l1", SM(), n_clients=8,
                              comm_rounds=10, local_epochs=4)
        assert fed.rounds == 10
        assert fed.obj.shape == (10,)
        # the returned iterate is the BEST round's average
        best = float(np.min(fed.obj))
        assert float(prob.f_val(prob.A, prob.y, fed.x)
                     + prob.reg("l1", fed.x)) == pytest.approx(best)
        # the averaging fixed point sits within a few percent of the
        # centralized optimum on an IID split (documented bias)
        gap = (best - central.obj[-1]) / abs(central.obj[-1])
        assert 0 <= gap < 0.05, gap

    def test_best_round_returned_when_not_monotone(self):
        """Underdetermined local problems (rows/client ~ n) make the
        centralized objective non-monotone under averaging — the result
        must still be the best round's average."""
        prob = _prob(m=256, n=32, seed=7)
        fed = federated_solve(METH(), prob, "l1", SM(), n_clients=8,
                              comm_rounds=4, local_epochs=3)
        assert float(np.min(fed.obj)) == pytest.approx(
            float(prob.f_val(prob.A, prob.y, fed.x)
                  + prob.reg("l1", fed.x)))

    def test_finish_via_sharded_solve(self):
        """The documented finisher recipe: federated warm start + the
        row-sharded solve closes most of the averaging gap — to within
        the damped-prox fixed-point spread (~0.5%), the same start
        -dependence the reference algorithm itself has."""
        prob = _prob()
        central = scso.iterate(METH(), prob, "l1", SM(), max_epoch=200,
                               verbose=0)
        fed = federated_solve(METH(), prob, "l1", SM(), n_clients=8,
                              comm_rounds=3, local_epochs=4)
        from scso_tpu._src.struct import replace as dc_replace
        warm = dc_replace(prob, x0=np.asarray(fed.x))
        finish = scso.iterate(METH(), shard_problem(warm, make_mesh()),
                              "l1", SM(), max_epoch=100, verbose=0)
        # strictly better than the federated best...
        assert finish.obj[-1] < np.min(fed.obj)
        # ...and within the fixed-point spread of the centralized value
        gap = (finish.obj[-1] - central.obj[-1]) / abs(central.obj[-1])
        assert gap < 5e-3, gap

    def test_weights_and_early_stop(self):
        prob = _prob()
        # uniform explicit weights == default
        f1 = federated_solve(METH(), prob, "l1", SM(), n_clients=4,
                             comm_rounds=3, local_epochs=3)
        f2 = federated_solve(METH(), prob, "l1", SM(), n_clients=4,
                             comm_rounds=3, local_epochs=3,
                             weights=np.ones(4))
        np.testing.assert_array_equal(f1.x, f2.x)
        # f_tol stops once rounds stop paying
        f3 = federated_solve(METH(), prob, "l1", SM(), n_clients=4,
                             comm_rounds=30, local_epochs=3, f_tol=1e-6)
        assert f3.rounds < 30
        assert f3.client_epochs.shape == (f3.rounds, 4)

    def test_zero_cold_start_still_solves(self):
        """The degenerate f_tol-at-zero guard (same as sweep's): a zero
        x0 with the default x_star must not freeze local solves at
        epoch 0 — the run must make real progress."""
        from scso_tpu._src.struct import replace as dc_replace

        prob = _prob()
        prob0 = dc_replace(prob, x0=np.zeros_like(np.asarray(prob.x0)))
        fed = federated_solve(METH(), prob0, "l1", SM(), n_clients=8,
                              comm_rounds=3, local_epochs=4)
        obj_at_zero = float(prob.f_val(prob.A, prob.y,
                                       np.zeros(prob.x0.shape[-1])))
        assert np.min(fed.obj) < obj_at_zero - 1e-3
        assert np.any(fed.client_epochs > 0)

    def test_group_lasso_federated(self):
        """Group structure must carry the client axis (the fleet vmaps
        every leaf) — gl federated solves run and make progress."""
        from scso_tpu.models import synthetic as syn

        A, y, x0, _ = syn.make_sparse_logreg_data(
            256, 24, density=0.25, n_active=6, seed=5, dtype=np.float64)
        groups = scso.make_contiguous_groups(24, 4)
        prob = scso.Problem(A, y, x0, losses.logistic_f,
                            [1e-3, 1e-2], grad_fx=losses.logistic_grad,
                            hess_fx=losses.logistic_hess, groups=groups,
                            dtype=np.float64)
        sm = scso.PHuberSmootherGL(1.0, prob)
        fed = federated_solve(METH(), prob, "gl", sm, n_clients=4,
                              comm_rounds=3, local_epochs=4)
        assert np.all(np.isfinite(fed.obj))
        assert fed.obj.shape == (3,)
        central = scso.iterate(METH(), prob, "gl", sm, max_epoch=100,
                               verbose=0)
        gap = (np.min(fed.obj) - central.obj[-1]) / abs(central.obj[-1])
        assert gap < 0.08, gap

    def test_rejects_or_strips_sharded_input(self):
        """split_clients strips mesh/data_axis: local solves are local
        (a leaked mesh would trace shard_map collectives under vmap)."""
        prob = _prob()
        sh = shard_problem(prob, make_mesh())
        cl = split_clients(sh, 8)
        assert cl.mesh is None and cl.data_axis is None

    def test_client_axis_on_mesh(self):
        prob = _prob()
        plain = federated_solve(METH(), prob, "l1", SM(), n_clients=8,
                                comm_rounds=2, local_epochs=3)
        meshed = federated_solve(METH(), prob, "l1", SM(), n_clients=8,
                                 comm_rounds=2, local_epochs=3,
                                 mesh=make_mesh((8,), ("batch",)))
        np.testing.assert_allclose(meshed.x, plain.x, atol=1e-12)
