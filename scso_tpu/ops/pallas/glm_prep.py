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
from typing import NamedTuple

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
               b_acc, hd_acc, b_c, hd_c):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for r in (b_acc, hd_acc, b_c, hd_c):
                r[:] = jnp.zeros_like(r)

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
        # compensated cross-tile accumulation (see _kahan_add): the
        # RHS pullback drives the outer fixed point — at 10⁷ rows the
        # plain sequential sum's ~sqrt(T)·eps drift reaches ~1e-5
        _kahan_add(b_acc, b_c,                          # A_bᵀ·rw → (1, n)
                   jnp.sum(a * rw, axis=0, keepdims=True))
        _kahan_add(hd_acc, hd_c,                        # (A²)_bᵀ·w
                   jnp.sum(a * a * w, axis=0, keepdims=True))

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
                        pltpu.VMEM((1, n), acc_dtype),
                        # Kahan compensation buffers (see _kahan_add)
                        pltpu.VMEM((1, n), acc_dtype),
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


# ---------------------------------------------------------------------------
# Dual-candidate prep: the greedy-α trial FUSED with the next epoch's prep
# ---------------------------------------------------------------------------


class PairPrep(NamedTuple):
    """Per-candidate epoch prep from one A read (t = greedy trial
    candidate, d = SCORE-damped candidate). ``loss_*`` are RAW per-sample
    loss SUMS over the true rows — the caller rescales by 1/m for
    sample-normalized GLM specs."""

    w_t: jax.Array      # (m,)  CG matvec weights at x_trial
    w_d: jax.Array      # (m,)  … at x_damped
    b_t: jax.Array      # (n,)  Aᵀ·rw(y, A·x_trial)
    b_d: jax.Array      # (n,)
    hd_t: jax.Array     # (n,)  Σᵢ wᵢ·Aᵢⱼ²
    hd_d: jax.Array     # (n,)
    loss_t: jax.Array   # ()    Σᵢ ℓ(yᵢ, zᵢ)  (unnormalized)
    loss_d: jax.Array   # ()


def _kahan_add(acc_ref, comp_ref, partial):
    """Compensated accumulation across the sequential TPU grid.

    Plain `acc += partial` over T tiles drifts by ~sqrt(T)·eps relative —
    at m = 5·10⁵ f32 that is ~4e-6 on the loss sum, ABOVE the 1e-6
    objective-gap resolution the greedy accept test and the stopping
    criterion need (measured: the cached greedy path at 524288×1024
    stalled at a 1.7e-6 gap with 97 oscillating epochs before this fix).
    Kahan summation brings the error back to ~eps independent of T for
    two extra VPU ops per element — free on a bandwidth-bound kernel."""
    y = partial - comp_ref[:]
    t = acc_ref[:] + y
    comp_ref[:] = (t - acc_ref[:]) - y
    acc_ref[:] = t


def _make_pair_kernel(rw_fn, w_fn, loss_fn, acc_dtype, br, m_true):
    def kernel(a_ref, y_ref, xt_ref, xd_ref,
               wt_ref, wd_ref, bt_ref, bd_ref, ht_ref, hd_ref,
               lt_ref, ld_ref,
               bt_acc, bd_acc, ht_acc, hd_acc, lt_acc, ld_acc,
               bt_c, bd_c, ht_c, hd_c, lt_c, ld_c):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for r in (bt_acc, bd_acc, ht_acc, hd_acc, lt_acc, ld_acc,
                      bt_c, bd_c, ht_c, hd_c, lt_c, ld_c):
                r[:] = jnp.zeros_like(r)

        # layout rules as in matvec.py/_make_kernel: (1, n) rows, (br, 1)
        # per-row columns, VPU broadcast-multiply-reduces for the
        # n-contractions
        a = a_ref[:].astype(acc_dtype)                  # (BR, n)
        aa = a * a
        y = y_ref[:].astype(acc_dtype)                  # (BR, 1)
        # valid-row mask for the LOSS only: padded rows of A are zero, so
        # their b/hdiag contributions vanish on their own, but
        # loss_fn(y_pad, 0) does not
        row = i * br + jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)
        valid = (row < m_true).astype(acc_dtype)

        for x_ref, w_out, b_acc, b_c, h_acc, h_c, l_acc, l_c in (
                (xt_ref, wt_ref, bt_acc, bt_c, ht_acc, ht_c, lt_acc,
                 lt_c),
                (xd_ref, wd_ref, bd_acc, bd_c, hd_acc, hd_c, ld_acc,
                 ld_c)):
            x = x_ref[:].astype(acc_dtype)              # (1, n)
            z = jnp.sum(a * x, axis=1, keepdims=True)   # (BR, 1)
            rw = rw_fn(y, z)
            w = w_fn(y, z)
            w_out[:] = w.astype(w_out.dtype)
            _kahan_add(b_acc, b_c,
                       jnp.sum(a * rw, axis=0, keepdims=True))
            _kahan_add(h_acc, h_c,
                       jnp.sum(aa * w, axis=0, keepdims=True))
            _kahan_add(l_acc, l_c,
                       jnp.sum(valid * loss_fn(y, z), axis=0,
                               keepdims=True))

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            bt_ref[:] = bt_acc[:].astype(bt_ref.dtype)
            bd_ref[:] = bd_acc[:].astype(bd_ref.dtype)
            ht_ref[:] = ht_acc[:].astype(ht_ref.dtype)
            hd_ref[:] = hd_acc[:].astype(hd_ref.dtype)
            lt_ref[:] = lt_acc[:].astype(lt_ref.dtype)
            ld_ref[:] = ld_acc[:].astype(ld_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("rw_fn", "w_fn", "loss_fn", "interpret"))
def _fused_glm_prep_pair(A, y, x_t, x_d, rw_fn, w_fn, loss_fn,
                         interpret=False):
    m, n = A.shape
    dt = x_t.dtype
    # same halved block as _fused_glm_prep: the aa squared tile is an
    # extra tile-sized buffer
    br = max(8, (_pick_block_rows(m, n, A.dtype.itemsize) // 2 // 8) * 8)
    pad = (-m) % br
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, n), A.dtype)])
        y = jnp.concatenate([y, jnp.full((pad,), 0.5, y.dtype)])
    mp = m + pad
    acc_dtype = jnp.float64 if dt == jnp.float64 else jnp.float32

    row_spec = pl.BlockSpec((1, n), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((br, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_pair_kernel(rw_fn, w_fn, loss_fn, acc_dtype, br, m),
        grid=(mp // br,),
        in_specs=[
            pl.BlockSpec((br, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            col_spec, row_spec, row_spec,
        ],
        out_specs=(col_spec, col_spec, row_spec, row_spec, row_spec,
                   row_spec, sc_spec, sc_spec),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), dt),
            jax.ShapeDtypeStruct((mp, 1), dt),
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        scratch_shapes=[pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, 1), acc_dtype),
                        pltpu.VMEM((1, 1), acc_dtype),
                        # Kahan compensation buffers (see _kahan_add)
                        pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, n), acc_dtype),
                        pltpu.VMEM((1, 1), acc_dtype),
                        pltpu.VMEM((1, 1), acc_dtype)],
        interpret=interpret,
    )(A, y.reshape(-1, 1), x_t.reshape(1, -1), x_d.reshape(1, -1))
    wt, wd, bt, bd, ht, hd, lt, ld = outs
    return PairPrep(
        wt.reshape(-1)[:m], wd.reshape(-1)[:m],
        bt.reshape(-1), bd.reshape(-1),
        ht.reshape(-1), hd.reshape(-1),
        lt.reshape(()), ld.reshape(()))


def fused_glm_prep_pair(A, y, x_t, x_d, rw_fn, w_fn, loss_fn) -> PairPrep:
    """Epoch prep for TWO candidate iterates in ONE pass over A.

    This is the epoch-fused greedy-α engine (steps._greedy_update_cached):
    the greedy trial's objective evaluation and the NEXT epoch's CG prep
    (RHS pullback, matvec weights, Jacobi diagonal) for both the trial
    and the damped candidate come from a single A read — whichever
    candidate wins, its prep is already done, so the per-epoch A-traffic
    drops from ~5 passes (prep + trial F(x) + trial F(x') + stats) to
    the CG matvecs plus this one.

    ``rw_fn``/``w_fn``/``loss_fn`` must be elementwise in (y, z);
    ``loss_fn`` is the RAW per-sample loss (GLMSpec.loss_sample) — the
    returned ``loss_*`` are sums over the true rows, NOT yet divided
    by m. Falls back to a jnp path (one A@[x_t x_d] matmul + per-column
    pullbacks) off-kernel-supported shapes — same outputs, more passes.
    """
    m, n = A.shape
    if not supports_fused_normal_matvec(m, n, A.dtype.itemsize):
        Z2 = A @ jnp.stack([x_t, x_d], axis=1)

        def col(z):
            rw = rw_fn(y, z)
            w = w_fn(y, z)
            return (w, A.T @ rw, jnp.einsum("i,ij,ij->j", w, A, A),
                    jnp.sum(loss_fn(y, z)))

        wt, bt, ht, lt = col(Z2[:, 0])
        wd, bd, hd, ld = col(Z2[:, 1])
        return PairPrep(wt, wd, bt, bd, ht, hd, lt, ld)
    counters.bump("fused_glm_prep_pair")
    interpret = jax.default_backend() != "tpu"
    return _fused_glm_prep_pair(A, y, x_t, x_d, rw_fn, w_fn, loss_fn,
                                interpret=interpret)
