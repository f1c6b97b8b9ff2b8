"""Numeric sanitizers and failure recovery (SURVEY.md §5).

The reference is single-threaded with no sanitizers or recovery — errors
propagate (`Base.error`). TPU-natively the equivalents are JAX's debug
modes (the "sanitizers" for numerics) and snapshot-based retry around
the instrumented solve loop.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax


@contextlib.contextmanager
def sanitize(nans: bool = True, disable_jit: bool = False):
    """Run solves under JAX's numeric sanitizers.

    ``nans=True`` raises at the first NaN produced by any jitted
    computation (jax_debug_nans); ``disable_jit=True`` runs op-by-op for
    pdb-friendly debugging. Both are restored on exit.
    """
    old_nans = jax.config.jax_debug_nans
    old_jit = jax.config.jax_disable_jit
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_disable_jit", disable_jit)
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_disable_jit", old_jit)


def solve_with_recovery(method, model, reg_name, h_mu, *, chunk_epochs=50,
                        max_chunks=20, retries=2, on_nan="restart",
                        fault_inject=None, **kwargs):
    """Chunked solve with snapshot-based failure recovery.

    Runs the solve in ``chunk_epochs``-sized chunks, snapshotting the
    FULL solver carry (``Solution.state``: iterate, L-BFGS memory, CG
    warm-start direction, gradient caches, histories, RNG key) between
    chunks. On a failed chunk (exception, or non-finite iterate with
    ``on_nan='restart'``) the chunk is retried from the last good
    snapshot up to ``retries`` times — so a recovered run BIT-MATCHES an
    uninterrupted one (full-carry resume, not a bare ``x0`` warm start;
    the resume path is the same one tested in
    tests/test_group_lasso_e2e.py). Multi-host transients lose at most
    one chunk of work; a DETERMINISTIC failure (the same NaN reproduced
    from the same snapshot) exhausts ``retries`` and re-raises.

    ``fault_inject``: optional callback ``(chunk_idx, attempt) -> None``
    invoked before each chunk attempt; raising ``RuntimeError`` from it
    simulates a transient failure (the fault-injection hook for testing
    recovery — SURVEY.md §5).
    """
    from scso_tpu.algorithms.iterate import iterate

    kwargs.pop("max_epoch", None)
    kwargs.pop("resume_state", None)
    state = None
    sol = None
    for chunk in range(max_chunks):
        cap = (chunk + 1) * chunk_epochs
        attempt = 0
        while True:
            try:
                if fault_inject is not None:
                    fault_inject(chunk, attempt)
                s = iterate(method, model, reg_name, h_mu, max_epoch=cap,
                            resume_state=state, **kwargs)
                if on_nan == "restart" and not np.all(np.isfinite(s.x)):
                    raise FloatingPointError("non-finite iterate")
                break
            except (FloatingPointError, RuntimeError):
                attempt += 1
                if attempt > retries:
                    raise
        sol = s
        state = s.state  # last good full carry (epochs are cumulative)
        if s.epochs < cap:  # converged inside the chunk
            break
    return sol
