"""Worker process for the 2-process distributed test (test_distributed.py)
and the env-gated 2-process dryrun segment (__graft_entry__.py).

Run as: python _dist_worker.py <coordinator_port> <process_id> <workdir>

Each worker owns 4 virtual CPU devices; `jax.distributed.initialize`
joins them into one 8-device cluster via the gRPC coordinator on
localhost. The worker then loads the problem data written by the parent
through the out-of-core path (each process reads ONLY its own devices'
row shards — the canonical multi-host ingestion), runs a row-sharded
GGN-CG solve over the global mesh (psum crosses the process boundary),
and process 0 writes the solution for the parent to compare.

process_id = -1 is the SINGLE-PROCESS REFERENCE mode: no distributed
init — load the same on-disk data in-memory, run the identical solve
unsharded under the same (x64 CPU) config, and write x_single.npy. The
dryrun parent may itself run without x64, so the reference must come
from a subprocess with the workers' numeric config to compare at psum
tolerance.
"""

import os
import sys

port, pid_idx, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# config route, not env vars: the environment may pre-route jax to a TPU
# platform via sitecustomize (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_enable_x64", True)

import numpy as np

from scso_tpu.parallel.sharding import distributed_init, make_mesh

if pid_idx < 0:  # single-process reference mode
    import scso_tpu as scso
    from scso_tpu.models import losses

    A = np.load(os.path.join(workdir, "data", "A.npy"))
    y = np.load(os.path.join(workdir, "data", "y.npy"))
    x0 = np.load(os.path.join(workdir, "x0.npy"))
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
    np.save(os.path.join(workdir, "x_single.npy"), np.asarray(sol.x))
    print("worker -1: OK (single-process reference)")
    sys.exit(0)

n_global = distributed_init(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=pid_idx)
assert n_global == 8, f"expected 8 global devices, got {n_global}"
assert jax.process_count() == 2
assert len(jax.local_devices()) == 4

import scso_tpu as scso
from scso_tpu.models import losses
from scso_tpu.parallel import load_problem_rows_sharded

mesh = make_mesh((8,), ("data",))  # spans BOTH processes' devices
x0 = np.load(os.path.join(workdir, "x0.npy"))
prob = load_problem_rows_sharded(
    os.path.join(workdir, "data"), x0, losses.logistic01_f, 0.05, mesh,
    grad_fx=losses.logistic01_grad, out_fn=losses.sigmoid_out,
    grad_fy=losses.logistic_ggn_residual,
    hess_fy_diag=losses.logistic_ggn_qdiag,
    loss_fn=losses.logistic_loss_01,
    hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
    glm=losses.LOGISTIC01_GLM)

sol = scso.iterate(
    scso.ProxGGNSCORE(solver="cg", cg_tol=1e-10, cg_maxiter=50),
    prob, "l1", scso.PHuberSmootherL1L2(1.0),
    max_epoch=25, x_tol=1e-12, f_tol=0.0, verbose=0)

x = np.asarray(sol.x)
assert np.all(np.isfinite(x)), "distributed solve produced non-finite x"
if pid_idx == 0:
    np.save(os.path.join(workdir, "x_dist.npy"), x)
print(f"worker {pid_idx}: OK epochs={sol.epochs}")
