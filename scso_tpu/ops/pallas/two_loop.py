"""L-BFGS two-loop recursion as a single Pallas kernel.

The XLA path (scso_tpu.ops.lbfgs_core.two_loop) runs two `lax.scan`s of m
steps, each step gathering an (n,) row of S and Y from HBM — the (m, n)
memory is streamed from HBM twice per call. This kernel loads S, Y ONCE
into VMEM and runs both loops on-chip: 2m dot-reductions + axpys on
resident data, one kernel launch, half the HBM traffic.

Semantics are identical to lbfgs_core.two_loop (parity:
two_loop_recursion, prox-L-BFGS-SCORE.jl:47-68) including the circular
addressing (pos, count) and the empty-slot masking. Requires
2·m·n·itemsize ≲ 8 MB of VMEM (m=10 ⇒ n ≤ 100k f32); callers fall back
to the scan path beyond that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scso_tpu.ops.lbfgs_core import LBFGSMemory
from scso_tpu.ops.pallas import counters

_LANES = 128
_VMEM_BUDGET = 8 * 1024 * 1024


def _make_kernel(m: int, acc_dtype):
    def kernel(int_ref, h0_ref, S_ref, Y_ref, g_ref, out_ref, alpha_ref):
        pos = int_ref[0]
        count = int_ref[1]
        dt = g_ref.dtype

        q = g_ref[:].astype(acc_dtype)
        # first loop: newest → oldest (k = 0 is the newest pair)
        for k in range(m):
            idx = (pos - 1 - k) % m
            valid = k < count
            s = S_ref[idx].astype(acc_dtype)
            y = Y_ref[idx].astype(acc_dtype)
            ys = jnp.sum(y * s)
            rho = jnp.where(ys != 0, 1.0 / jnp.where(ys == 0, 1.0, ys), 0.0)
            alpha = rho * jnp.sum(s * q)
            alpha_ref[k] = alpha
            q = jnp.where(valid, q - alpha * y, q)

        r = h0_ref[0].astype(acc_dtype) * q
        # second loop: oldest → newest
        for k in range(m - 1, -1, -1):
            idx = (pos - 1 - k) % m
            valid = k < count
            s = S_ref[idx].astype(acc_dtype)
            y = Y_ref[idx].astype(acc_dtype)
            ys = jnp.sum(y * s)
            rho = jnp.where(ys != 0, 1.0 / jnp.where(ys == 0, 1.0, ys), 0.0)
            beta = rho * jnp.sum(y * r)
            r = jnp.where(valid, r + s * (alpha_ref[k] - beta), r)

        out_ref[:] = (-r).astype(dt)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _two_loop_pallas(S, Y, grad, pos, count, H0, interpret=False):
    m, n = S.shape
    dt = grad.dtype
    rows = -(-n // _LANES)
    rows = -(-rows // 8) * 8
    pad = rows * _LANES - n

    def pad2(M):
        if pad:
            M = jnp.concatenate([M, jnp.zeros((m, pad), M.dtype)], axis=1)
        return M.reshape(m, rows, _LANES)

    Sb, Yb = pad2(S), pad2(Y)
    gb = (jnp.concatenate([grad, jnp.zeros((pad,), dt)]) if pad
          else grad).reshape(rows, _LANES)
    acc_dtype = jnp.float64 if dt == jnp.float64 else jnp.float32

    ints = jnp.stack([pos.astype(jnp.int32), count.astype(jnp.int32)])
    out = pl.pallas_call(
        _make_kernel(m, acc_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos, count
            pl.BlockSpec(memory_space=pltpu.SMEM),   # H0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # S
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Y
            pl.BlockSpec(memory_space=pltpu.VMEM),   # grad
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), dt),
        scratch_shapes=[pltpu.SMEM((m,), acc_dtype)],
        interpret=interpret,
    )(ints, jnp.reshape(H0, (1,)).astype(dt), Sb, Yb, gb)
    return out.reshape(-1)[:n]


def supports_fused_two_loop(m: int, n: int, itemsize: int) -> bool:
    return 2 * m * n * itemsize <= _VMEM_BUDGET


def fused_two_loop(mem: LBFGSMemory, grad: jax.Array) -> jax.Array:
    """d = −H·grad via the on-chip two-loop kernel (falls back per-shape)."""
    from scso_tpu.ops.lbfgs_core import two_loop

    m, n = mem.S.shape
    if not supports_fused_two_loop(m, n, mem.S.dtype.itemsize):
        return two_loop(mem, grad)
    counters.bump("fused_two_loop")
    interpret = jax.default_backend() != "tpu"
    return _two_loop_pallas(mem.S, mem.Y, grad, mem.pos, mem.count, mem.H0,
                            interpret=interpret)
