"""Synthetic problem generators for the benchmark configurations.

Covers the data-generation utilities the reference delegates to its
Python sibling (`pyscsopt.utils.make_group_lasso_problem`,
README.md:190-210) and the README's sprandn logistic-regression setup
(README.md:100-110), so the framework is self-contained.
"""

from __future__ import annotations

import numpy as np

from scso_tpu.ops.groups import make_contiguous_groups


def make_sparse_logreg_data(m: int, n: int, density: float = 0.01,
                            n_active: int = None, seed: int = 1234,
                            dtype=np.float32, label01: bool = False,
                            backend: str = "numpy"):
    """Random sparse-design logistic regression data.

    Mirrors the README example (README.md:100-110): A ~ sprandn(m, n,
    density) densified, labels from a Bernoulli at a ground-truth x
    (zeros by default, giving balanced random labels). ``label01=False``
    gives ±1 labels (pair with losses.logistic_*); ``label01=True`` gives
    0/1 labels (pair with losses.logistic01_* — REQUIRED for GGN, see
    losses.py).

    ``backend='native'`` uses the OpenMP C++ generator
    (scso_tpu._native) — a different RNG stream than numpy (not
    bit-compatible; use for large-scale benchmarks, not oracle tests).

    Returns (A, y, x0, x_true).
    """
    if backend == "native":
        from scso_tpu import _native

        out = _native.sparse_logreg(m, n, density,
                                    n_active or 0, seed, label01)
        if out is not None:
            A, y, x0, x_true = out
            cast = lambda a: a.astype(dtype) if a.dtype != dtype else a
            return cast(A), cast(y), cast(x0), cast(x_true)
        # toolchain unavailable → fall through to numpy
    rng = np.random.default_rng(seed)
    A = np.zeros((m, n), dtype=dtype)
    nnz = max(1, int(density * m * n))
    rows = rng.integers(0, m, size=nnz)
    cols = rng.integers(0, n, size=nnz)
    A[rows, cols] = rng.standard_normal(nnz).astype(dtype)
    if n_active:
        x_true = np.zeros((n,), dtype=dtype)
        idx = rng.choice(n, size=n_active, replace=False)
        x_true[idx] = rng.standard_normal(n_active).astype(dtype)
    else:
        x_true = np.zeros((n,), dtype=dtype)
    p = 1.0 / (1.0 + np.exp(-(A @ x_true)))
    lo = 0.0 if label01 else -1.0
    y = np.where(rng.random(m) < p, 1.0, lo).astype(dtype)
    x0 = rng.standard_normal(n).astype(dtype)
    return A, y, x0, x_true


def make_group_lasso_problem(m: int, n: int, grpsize: int,
                             p_active: float = 0.1, noise_std: float = 0.1,
                             seed: int = 1234, group_weights: float = 1.0,
                             corr: float = 0.0, dtype=np.float32):
    """Grouped sparse regression data — our `pyscsopt` utility equivalent
    (README.md:196-201).

    Returns (A, y, x_true, x0, groups) with contiguous equal-size groups,
    a fraction `p_active` of groups carrying signal, optional AR(1)-style
    feature correlation `corr`, and Gaussian observation noise.
    """
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n)).astype(dtype)
    if corr > 0:
        for j in range(1, n):
            A[:, j] = corr * A[:, j - 1] + np.sqrt(1 - corr**2) * A[:, j]
    n_groups = (n + grpsize - 1) // grpsize
    active = rng.random(n_groups) < p_active
    if not active.any():
        active[rng.integers(0, n_groups)] = True
    x_true = np.zeros((n,), dtype=dtype)
    for g in range(n_groups):
        if active[g]:
            s, e = g * grpsize, min((g + 1) * grpsize, n)
            x_true[s:e] = rng.standard_normal(e - s).astype(dtype)
    y = (A @ x_true + noise_std * rng.standard_normal(m)).astype(dtype)
    x0 = rng.standard_normal(n).astype(dtype)
    weights = np.full((n_groups,), group_weights, dtype=dtype)
    groups = make_contiguous_groups(n, grpsize, weights=weights, dtype=dtype)
    return A, y, x_true, x0, groups


def make_box_qp(n: int, seed: int = 1234, dtype=np.float32):
    """Random strongly-convex box QP — mirrors README.md:250-256.

    Returns (Q, c, x0) with Q = sym(randn) + n·I.
    """
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n)).astype(dtype)
    Q = np.tril(Q)
    Q = Q + Q.T - np.diag(np.diag(Q))
    Q = Q + n * np.eye(n, dtype=dtype)
    c = np.ones((n,), dtype=dtype)
    x0 = rng.standard_normal(n).astype(dtype)
    return Q.astype(dtype), c, x0


def make_sparse_poisson_data(m: int, n: int, density: float = 0.05,
                             n_active: int = None, seed: int = 1234,
                             dtype=np.float32, scale: float = 0.5):
    """Random sparse-design Poisson regression data (counts, log link).

    Same sprandn design as :func:`make_sparse_logreg_data`; the active
    coefficients are scaled by ``scale/sqrt(n_active·density·m/m)`` — i.e.
    kept small so the linear predictor z = A·x_true stays moderate
    (exp(z) must not overflow; see losses.poisson_f). Counts are drawn
    y_i ~ Poisson(exp(z_i)).

    Returns (A, y, x0, x_true).
    """
    rng = np.random.default_rng(seed)
    A = np.zeros((m, n), dtype=dtype)
    nnz = max(1, int(density * m * n))
    rows = rng.integers(0, m, size=nnz)
    cols = rng.integers(0, n, size=nnz)
    A[rows, cols] = rng.standard_normal(nnz).astype(dtype)
    x_true = np.zeros((n,), dtype=dtype)
    if n_active:
        idx = rng.choice(n, size=n_active, replace=False)
        x_true[idx] = (scale * rng.standard_normal(n_active)).astype(dtype)
    z = np.clip(A @ x_true, -8.0, 8.0).astype(np.float64)
    y = rng.poisson(np.exp(z)).astype(dtype)
    x0 = (0.01 * rng.standard_normal(n)).astype(dtype)
    return A, y, x0, x_true


def make_multinomial_data(m: int, p: int, k: int, seed: int = 1234,
                          dtype=np.float32, scale: float = 1.0):
    """Dense-design softmax regression data.

    Labels are drawn by the Gumbel-max trick — argmax of the true logits
    plus Gumbel noise is an EXACT sample from softmax(A·W_true), so the
    generated one-hot Y follows the model the multinom losses assume.

    Returns (A, Y_onehot, x0, x_true) with x_true = vec(W_true) —
    shapes (m, p), (m, k), (p·k,), (p·k,).
    """
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, p)).astype(dtype)
    W = (scale * rng.standard_normal((p, k))).astype(dtype)
    labels = np.argmax(A @ W + rng.gumbel(size=(m, k)), axis=-1)
    Y = np.eye(k, dtype=dtype)[labels]
    x0 = (0.01 * rng.standard_normal(p * k)).astype(dtype)
    return A, Y, x0, W.reshape(-1).astype(dtype)
