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
import jax.numpy as jnp


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
                        **kwargs):
    """Chunked solve with snapshot-based failure recovery.

    Runs the solve in ``chunk_epochs``-sized chunks, snapshotting the
    iterate between chunks. On a failed chunk (exception, or non-finite
    iterate with ``on_nan='restart'``) the chunk is retried from the last
    good snapshot up to ``retries`` times; multi-host transients and
    NaN-producing steps therefore lose at most one chunk of work. Returns
    the last chunk's Solution with cumulative epoch count.
    """
    from scso_tpu.algorithms.iterate import iterate
    from scso_tpu._src.struct import replace as dc_replace

    kwargs.pop("max_epoch", None)
    cur = model
    total_epochs = 0
    sol = None
    for _ in range(max_chunks):
        attempt = 0
        while True:
            try:
                s = iterate(method, cur, reg_name, h_mu,
                            max_epoch=chunk_epochs, **kwargs)
                if on_nan == "restart" and not np.all(np.isfinite(s.x)):
                    raise FloatingPointError("non-finite iterate")
                break
            except (FloatingPointError, RuntimeError):
                attempt += 1
                if attempt > retries:
                    raise
        total_epochs += s.epochs
        sol = s
        if s.epochs < chunk_epochs:  # converged inside the chunk
            break
        cur = dc_replace(cur, x0=jnp.asarray(s.x))
    sol.epochs = total_epochs
    return sol
