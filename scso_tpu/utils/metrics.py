"""Metrics and data helpers — parity: utils/utils.jl.

The reference's `MLUtils.DataLoader` batching (utils/utils.jl:14-25) is
host-side and dynamic; our solver batches ON DEVICE inside the fused
epoch loop (scso_tpu.algorithms.iterate `_make_batches`), so the helpers
here exist for API parity and for users who want host-side iteration.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def mean_square_error(y, yhat):
    """MSE — parity: mean_square_error (utils/utils.jl:3-5)."""
    y = jnp.asarray(y)
    yhat = jnp.asarray(yhat)
    return jnp.mean((y - yhat) ** 2)


def slice_data(A, y, i):
    """The i-th single-sample slice — parity: slice_data (utils/utils.jl:14-16)."""
    return A[i : i + 1], y[i : i + 1]


def batch_iter(A, y, batch_size: int, *, shuffle: bool = True, seed: int = 0):
    """Host-side minibatch iterator — parity: get_data_loader
    (utils/utils.jl:18-20). Yields (A_batch, y_batch) views; the last
    ragged batch is dropped (static-shape convention)."""
    m = A.shape[0]
    idx = np.arange(m)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    nb = m // batch_size
    for b in range(nb):
        sel = idx[b * batch_size : (b + 1) * batch_size]
        yield A[sel], y[sel]
