"""Aux subsystems: checkpoint/resume, failure recovery, profiling.

The reference has none of these (SURVEY.md §5) — solver state here is a
pytree, so checkpointing is plain serialization and resume is a warm
start; `solve_with_recovery` retries failed chunks from the last good
snapshot; `trace_phase`/`profile_to` hook `jax.profiler`.
"""

import tempfile
from pathlib import Path

import numpy as np
import jax.numpy as jnp

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.utils import (
    load_state,
    save_state,
    solve_with_recovery,
    trace_phase,
)
from scso_tpu._src.struct import replace as dc_replace


def main():
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        512, 64, density=0.2, n_active=8, seed=5, dtype=np.float64,
        label01=True)
    prob = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                        grad_fx=losses.logistic01_grad,
                        glm=losses.LOGISTIC01_GLM, dtype=np.float64)
    sm = scso.PHuberSmootherL1L2(1.0)
    method = scso.ProxGGNSCORE(solver="cg")

    # 1. partial solve → full-state checkpoint → bit-identical resume
    # (sol.state is the complete while_loop carry: iterate, grad caches,
    #  CG warm start, L-BFGS memory, histories, RNG key)
    with trace_phase("partial-solve"):
        part = scso.iterate(method, prob, "l1", sm, max_epoch=20,
                            verbose=0, alpha=1.0)
    ckpt = Path(tempfile.mkdtemp()) / "solver_state.npz"
    save_state(str(ckpt), part.state)
    print(f"checkpointed at epoch {part.epochs}: obj={part.obj[-1]:.8f}")

    state = load_state(str(ckpt), template=part.state)
    resumed = scso.iterate(method, prob, "l1", sm, max_epoch=200,
                           verbose=0, alpha=1.0, resume_state=state)
    print(f"resumed to epoch {resumed.epochs}: obj={resumed.obj[-1]:.8f}")

    # warm start (x only) remains available for changed problems/methods
    x_warm = jnp.asarray(np.asarray(part.x))
    warm = scso.iterate(scso.ProxLQNSCORE(), dc_replace(prob, x0=x_warm),
                        "l1", sm, max_epoch=50, verbose=0)
    print(f"warm-started L-BFGS: {warm.epochs} epochs, "
          f"obj={warm.obj[-1]:.8f}")

    # 2. chunked solve with snapshot-based failure recovery
    rec = solve_with_recovery(method, prob, "l1", sm, chunk_epochs=25,
                              verbose=0, alpha=1.0)
    print(f"recovery-wrapped solve: {rec.epochs} epochs, "
          f"obj={rec.obj[-1]:.8f}")
    return resumed


if __name__ == "__main__":
    main()
