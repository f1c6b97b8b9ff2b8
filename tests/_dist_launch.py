"""Shared launcher for the 2-process distributed solve.

One copy of the orchestration (port pick, canonical dataset, worker
spawn/timeout/kill) serves both consumers of tests/_dist_worker.py —
the pytest (tests/test_distributed.py) and the env-gated dryrun segment
(__graft_entry__._dryrun_two_process) — so a change to the worker
protocol cannot drift between them.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def make_data(workdir: str):
    """Write the canonical 64×16 f64 seed-7 dataset (+ x0) the worker
    loads; returns (A, y, x0) for in-parent reference solves."""
    import numpy as np

    from scso_tpu.models import synthetic
    from scso_tpu.parallel import save_problem_data

    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        64, 16, density=0.3, n_active=4, seed=7, dtype=np.float64,
        label01=True)
    save_problem_data(os.path.join(workdir, "data"), A, y)
    np.save(os.path.join(workdir, "x0.npy"), x0)
    return A, y, x0


def launch_workers(workdir: str, port: int, ids=(0, 1), timeout=420):
    """Spawn _dist_worker.py once per id (−1 = the single-process
    reference mode) and wait; returns [(returncode, output), ...]."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their device count
    worker = os.path.join(_HERE, "_dist_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for i in ids
    ]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return [(p.returncode, o) for p, o in zip(procs, outs)]
