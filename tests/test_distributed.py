"""Multi-process distributed execution: `jax.distributed.initialize` for real.

SURVEY.md §5 "Distributed communication backend": the framework's
multi-host story is `jax.distributed.initialize` + a global mesh +
XLA collectives. Everything else in the suite is single-process (the
8-device mesh is virtual); this test actually executes the multi-process
init + cross-process psum path on the CPU backend — two subprocesses
with 4 virtual devices each, joined by the gRPC coordinator into one
8-device cluster, each reading only its own row shards from disk
(`load_problem_rows_sharded`), solving over the global mesh, and the
result is checked against a single-process solve of the same problem.
"""

import os

import numpy as np
import pytest

import scso_tpu as scso
from scso_tpu.models import losses

from _dist_launch import free_port, launch_workers, make_data

_HERE = os.path.dirname(os.path.abspath(__file__))


def _single_process_solution(A, y, x0):
    prob = scso.Problem(
        A, y, x0, losses.logistic01_f, 0.05,
        grad_fx=losses.logistic01_grad, out_fn=losses.sigmoid_out,
        grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM, dtype=np.float64)
    sol = scso.iterate(
        scso.ProxGGNSCORE(solver="cg", cg_tol=1e-10, cg_maxiter=50),
        prob, "l1", scso.PHuberSmootherL1L2(1.0),
        max_epoch=25, x_tol=1e-12, f_tol=0.0, verbose=0)
    return np.asarray(sol.x)


def test_two_process_solve_matches_single_process(tmp_path):
    """Two coordinated processes (gRPC, num_processes=2, 4 CPU devices
    each) row-shard the data across the process boundary and solve; the
    result must match the single-process solve to f64 psum tolerance."""
    workdir = str(tmp_path)
    A, y, x0 = make_data(workdir)
    port = free_port()

    results = launch_workers(workdir, port, ids=(0, 1))
    for i, (rc, out) in enumerate(results):
        assert rc == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i}: OK" in out

    x_dist = np.load(os.path.join(workdir, "x_dist.npy"))
    x_single = _single_process_solution(A, y, x0)
    np.testing.assert_allclose(x_dist, x_single, rtol=0, atol=1e-10)


def test_distributed_init_warns_instead_of_hiding_failures():
    """A failed/no-op initialize must surface a warning, not vanish —
    a multi-host launch silently falling back to single-process would
    shard over 1/N of the devices."""
    from scso_tpu.parallel import distributed_init

    with pytest.warns(UserWarning, match="did not complete"):
        # unreachable coordinator arguments raise inside initialize in a
        # way that is caught and reported
        n = distributed_init(coordinator_address="localhost:1",
                             num_processes=-1, process_id=0)
    assert n == len(__import__("jax").devices())
