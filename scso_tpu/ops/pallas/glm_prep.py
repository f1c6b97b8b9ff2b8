"""Fused GLM epoch-prep kernel: z, RHS pullback and Jacobi diagonal in
ONE pass over A.

Every Newton/GGN epoch on a GLM problem needs, before CG can start:

    z     = A·x                     (1 pass)
    rw    = ρ(y, z)   elementwise   (GGN: σ'·res; Newton: gradient resid)
    b_raw = Aᵀ·rw                   (1 pass)
    w     = ω(y, z)   elementwise   (CG matvec weights)
    hdiag = Σ_i w_i·A_ij²           (1 pass — Jacobi preconditioner)

— three full reads of A per epoch on the XLA path. This kernel keeps
each row tile in VMEM and produces all three in a single read:

    per tile b:  z_b = A_b·x          (MXU)
                 rw_b, w_b = ρ, ω     (VPU, user fns traced into kernel)
                 b_acc  += A_bᵀ·rw_b  (MXU)
                 hd_acc += A_b²ᵀ·w_b  (MXU, squared tile)
                 w out   = w_b

With warm-started CG needing only ~4 matvecs/epoch, this cuts the
per-epoch A-traffic by ~30%.

Contract: ρ/ω must be ELEMENTWISE in (y, z) with no reliance on global
shapes (pass per-sample forms; normalize outside or close over m).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scso_tpu.ops.pallas import counters
from scso_tpu.ops.pallas.matvec import (
    _pick_block_rows,
    supports_fused_normal_matvec,
)


def _make_kernel(rw_fn, w_fn, acc_dtype):
    def kernel(a_ref, y_ref, x_ref, w_out_ref, b_ref, hd_ref,
               b_acc, hd_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            b_acc[:] = jnp.zeros_like(b_acc)
            hd_acc[:] = jnp.zeros_like(hd_acc)

        # Layout rules as in matvec.py: length-n vectors are (1, n) rows,
        # per-row (length-br) vectors are (br, 1) columns, and the n-
        # contractions run on the VPU as broadcast-multiply-reduces (a
        # dot_general against a row vector makes Mosaic materialize a
        # transposed tile copy — a scoped-VMEM OOM).
        a = a_ref[:].astype(acc_dtype)                  # (BR, n)
        x = x_ref[:].astype(acc_dtype)                  # (1, n)
        z = jnp.sum(a * x, axis=1, keepdims=True)       # A_b·x → (BR, 1)
        y = y_ref[:].astype(acc_dtype)                  # (BR, 1)
        rw = rw_fn(y, z)                                # (BR, 1)
        w = w_fn(y, z)                                  # (BR, 1)
        w_out_ref[:] = w.astype(w_out_ref.dtype)
        b_acc[:] += jnp.sum(a * rw, axis=0,             # A_bᵀ·rw → (1, n)
                            keepdims=True)
        hd_acc[:] += jnp.sum(a * a * w, axis=0,         # (A²)_bᵀ·w → (1, n)
                             keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            b_ref[:] = b_acc[:].astype(b_ref.dtype)
            hd_ref[:] = hd_acc[:].astype(hd_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("rw_fn", "w_fn", "interpret"))
def _fused_glm_prep(A, y, x, rw_fn, w_fn, interpret=False):
    m, n = A.shape
    dt = x.dtype
    # halve the matvec kernel's block: the a*a squared tile is an extra
    # tile-sized VMEM buffer (full-size blocks OOM scoped VMEM by ~1.4MB)
    br = max(8, (_pick_block_rows(m, n, A.dtype.itemsize) // 2 // 8) * 8)
    pad = (-m) % br
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, n), A.dtype)])
        # pad labels with 0.5: keeps ρ/ω finite for any sane GLM; the
        # padded rows of A are zero so they contribute nothing to b/hdiag
        y = jnp.concatenate([y, jnp.full((pad,), 0.5, y.dtype)])
    mp = m + pad
    acc_dtype = jnp.float64 if dt == jnp.float64 else jnp.float32

    w, b, hd = pl.pallas_call(
        _make_kernel(rw_fn, w_fn, acc_dtype),
        grid=(mp // br,),
        in_specs=[
            pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), dt),
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, n), dt),
        ),
        scratch_shapes=[pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, n), acc_dtype)],
        interpret=interpret,
    )(A, y.reshape(-1, 1), x.reshape(1, -1))
    return w.reshape(-1)[:m], b.reshape(-1), hd.reshape(-1)


def fused_glm_prep(A, y, x, rw_fn, w_fn):
    """(w, Aᵀρ(y,Ax), Σᵢ ωᵢ·Aᵢⱼ²) in one pass over A.

    ``rw_fn(y, z)`` / ``w_fn(y, z)`` must be elementwise. Falls back to
    the three-pass jnp path off-kernel-supported shapes.
    """
    m, n = A.shape
    if not supports_fused_normal_matvec(m, n, A.dtype.itemsize):
        z = A @ x
        rw = rw_fn(y, z)
        w = w_fn(y, z)
        return w, A.T @ rw, jnp.einsum("i,ij,ij->j", w, A, A)
    counters.bump("fused_glm_prep")
    interpret = jax.default_backend() != "tpu"
    return _fused_glm_prep(A, y, x, rw_fn, w_fn, interpret=interpret)
