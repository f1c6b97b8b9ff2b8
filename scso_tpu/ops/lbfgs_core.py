"""L-BFGS memory and two-loop recursion with fixed-shape circular buffers.

TPU-native replacement for the reference's growing Julia `Vector{Vector}`
memory and dynamic two-loop (prox-L-BFGS-SCORE.jl:22-30,47-68,148-162):
the (s, y) pairs live in fixed (m, n) device buffers addressed by a
circular write position, so the whole recursion is a `lax.scan` over a
static memory size — fully jit/vmap compatible (a vmapped λ/μ sweep
carries one independent memory per problem instance).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LBFGSMemory(NamedTuple):
    """Circular (s, y) memory.

    S, Y: (m, n) buffers; ``pos`` is the next write slot, ``count`` the
    number of valid pairs (≤ m), ``H0`` the initial inverse-Hessian scale.
    """

    S: jax.Array
    Y: jax.Array
    pos: jax.Array
    count: jax.Array
    H0: jax.Array


def init_memory(n: int, m: int, dtype=jnp.float32) -> LBFGSMemory:
    """Fresh empty memory — parity: init! (prox-L-BFGS-SCORE.jl:31-36)."""
    return LBFGSMemory(
        S=jnp.zeros((m, n), dtype),
        Y=jnp.zeros((m, n), dtype),
        pos=jnp.int32(0),
        count=jnp.int32(0),
        H0=jnp.asarray(1.0, dtype),
    )


def two_loop(mem: LBFGSMemory, grad: jax.Array) -> jax.Array:
    """d = −H·grad via the standard two-loop recursion.

    Parity: two_loop_recursion (prox-L-BFGS-SCORE.jl:47-68): first loop
    newest→oldest accumulating α_i, then r = H0·q, second loop
    oldest→newest adding s_i(α_i − β_i). Invalid (empty) slots are masked
    to no-ops so the scan has static length m.
    """
    m = mem.S.shape[0]
    dt = grad.dtype

    def first_loop(q, k):
        # k = 0 is the newest pair
        idx = (mem.pos - 1 - k) % m
        valid = k < mem.count
        s = mem.S[idx]
        y = mem.Y[idx]
        ys = jnp.dot(y, s)
        rho = jnp.where(ys != 0, 1.0 / jnp.where(ys == 0, 1.0, ys), 0.0)
        alpha = rho * jnp.dot(s, q)
        q = jnp.where(valid, q - alpha * y, q)
        return q, (alpha, rho, idx, valid)

    q, (alphas, rhos, idxs, valids) = lax.scan(
        first_loop, grad.astype(dt), jnp.arange(m)
    )

    r = mem.H0 * q

    def second_loop(r, inputs):
        # iterate oldest→newest: reverse of the first loop's order
        alpha, rho, idx, valid = inputs
        s = mem.S[idx]
        y = mem.Y[idx]
        beta = rho * jnp.dot(y, r)
        r = jnp.where(valid, r + s * (alpha - beta), r)
        return r, None

    rev = lambda a: jnp.flip(a, axis=0)
    r, _ = lax.scan(second_loop, r, (rev(alphas), rev(rhos), rev(idxs), rev(valids)))
    return -r


def update_memory(mem: LBFGSMemory, delta: jax.Array, gamma: jax.Array,
                  *, curvature_tol: float = 1e-10) -> LBFGSMemory:
    """Curvature-guarded FIFO memory update.

    Parity: prox-L-BFGS-SCORE.jl:154-162 — accept the pair iff
    dot(δ, γ) > 1e-10, evicting the oldest at capacity, and refresh
    H0 = (γ·δ)/(γ·γ).
    """
    m = mem.S.shape[0]
    dg = jnp.dot(delta, gamma)
    accept = dg > curvature_tol

    S = jnp.where(accept, mem.S.at[mem.pos].set(delta), mem.S)
    Y = jnp.where(accept, mem.Y.at[mem.pos].set(gamma), mem.Y)
    pos = jnp.where(accept, (mem.pos + 1) % m, mem.pos)
    count = jnp.where(accept, jnp.minimum(mem.count + 1, m), mem.count)
    gg = jnp.dot(gamma, gamma)
    H0_new = dg / jnp.where(gg == 0, 1.0, gg)
    H0 = jnp.where(accept & (gg > 0), H0_new, mem.H0)
    return LBFGSMemory(S=S, Y=Y, pos=pos, count=count, H0=H0)
