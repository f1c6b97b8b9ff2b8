"""Fused multi-output GGN matvec: V ↦ Aᵀ·quad(y, Z, A·V) in ONE A read.

The multi-output (mglm) CG matvec is two (m×p)·(p×k) matmuls around the
per-sample k×k curvature action (steps._mo_glm_system) — XLA reads A
from HBM twice per CG iteration. Measured at 196608×1024×16 on v5e
(benchmarks/mglm_audit.py): the matvec runs at 370 GB/s effective and
CG matvecs are ~75% of the epoch, so halving their A-traffic is the one
fusion that pays (the 3-op epoch prep is already XLA-fused to 527 GB/s
effective — a prep kernel would buy ≤14%).

Kernel (grid over row blocks, A tile resident in VMEM for BOTH
contractions):

    per row-block b:  U_b  = A_b · V                      (MXU)
                      QU_b = quad(y_b, Z_b, U_b)·(BR/m)    (VPU)
                      acc += A_bᵀ · QU_b                   (MXU)

`quad` is the MOGLMSpec's per-sample curvature action, traced INTO the
kernel. MOGLMSpec contract: quad normalizes by its input's row count —
inside the kernel that is the TILE height BR, so the kernel rescales by
BR/m to restore the 1/m normalization (zero-padded tail rows contribute
exactly 0: their A rows are zero, so U and hence quad's P∘U terms
vanish).

Unlike the single-output kernel (ops/pallas/matvec.py, VPU
broadcast-reduce against (1, n) rows), k ≥ 8 output columns make both
contractions genuine MXU matmuls; the (BR, k) intermediates pad their
lane dimension to 128, which costs ~0.5 MB VMEM at BR = 1024 — budgeted
in `_pick_block_rows_mglm`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scso_tpu.ops.pallas import counters

_TILE_BYTES = 4 * 1024 * 1024
_SCOPED_VMEM = 14 * 1024 * 1024


_KP = 128  # lane padding of the k dimension


def _per_row_bytes(p: int, itemsize: int) -> int:
    """VMEM bytes that scale with the tile height BR — CALIBRATED from a
    measured Mosaic stack allocation (18.62 MB at BR=768, p=1024, k=16 ⇒
    ~24.8 KB/row): the double-buffered A tile (+ f32 upcast for narrow
    dtypes), THREE p-wide f32 allowances for Mosaic-materialized
    transposed/retiled copies around the two contractions, and the
    lane-padded k-blocks/temps."""
    eff = 2 * itemsize + (4 if itemsize < 4 else 0)
    return p * (eff + 12) + 8 * _KP * 4


def _fixed_bytes(p: int) -> int:
    return 3 * p * _KP * 4  # V, acc scratch, out — (p, k) lane-padded


def _pick_block_rows_mglm(m: int, p: int, k: int, itemsize: int) -> int:
    """Largest 128-multiple BR whose working set fits scoped VMEM."""
    avail = _SCOPED_VMEM - _fixed_bytes(p)
    br = avail // max(1, _per_row_bytes(p, itemsize))
    br = min(br, max(128, m), 2048)
    return (br // 128) * 128


def supports_fused_mglm_matvec(m: int, p: int, k: int,
                               itemsize: int = 4) -> bool:
    """Static feasibility: lane-aligned p, small k (lane-padded to 128),
    and at least a 128-row tile inside scoped VMEM."""
    if not (0 < k <= _KP and p % 128 == 0 and p > 0 and m >= 8):
        return False
    return _pick_block_rows_mglm(m, p, k, itemsize) >= 128


def _make_kernel(quad, scale: float, acc_dtype):
    """Variant A — k on the LANE dimension ((BR, k) intermediates).

    MEASURED LOSER at k ≪ 128 (196608×1024×16 on v5e: 4.83 ms vs the
    XLA pair's 4.36): the k dimension lane-pads to 128, so both MXU
    contractions do 128/k× the useful FLOPs — the halved HBM traffic is
    swamped by padded compute. Kept for k close to 128; `_make_kernel_t`
    (k on sublanes, 8-padding) is the small-k layout."""
    def _kernel(a_ref, y_ref, z_ref, v_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:].astype(acc_dtype)            # (BR, p)
        V = v_ref[:].astype(acc_dtype)            # (p, k)
        U = jax.lax.dot(a, V,
                        preferred_element_type=acc_dtype)   # (BR, k)
        QU = quad(y_ref[:], z_ref[:], U).astype(acc_dtype) * scale
        # contract over the row axis of BOTH operands — Aᵀ·QU without an
        # explicit transpose of the tile
        acc_ref[:] += jax.lax.dot_general(
            a, QU, (((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return _kernel


def _make_kernel_t(quad, scale: float, acc_dtype):
    """Variant B — k on the SUBLANE dimension ((k, ·) intermediates).

    All k-sized axes pad to a multiple of 8 sublanes instead of 128
    lanes, so the two MXU contractions do ~k/8-padded work instead of
    128-padded:  Uᵀ = Vᵀ·A_bᵀ as a lane-contraction ("nt" matmul) and
    acc += QUᵀ·A_b as a standard "nn" matmul. The spec's rowwise `quad`
    runs on small (BR, k) transposes of the (k, BR) blocks — VPU
    relayouts of ≤ 64 KB, noise next to the tile DMA."""
    def _kernel(a_ref, yt_ref, zt_ref, vt_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:].astype(acc_dtype)             # (BR, p)
        vt = vt_ref[:].astype(acc_dtype)           # (k, p)
        Ut = jax.lax.dot_general(                  # Vᵀ·A_bᵀ → (k, BR)
            vt, a, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype)
        QU = quad(yt_ref[:].T, zt_ref[:].T,
                  Ut.T).astype(acc_dtype) * scale  # rowwise → (BR, k)
        acc_ref[:] += jax.lax.dot_general(         # QUᵀ·A_b → (k, p)
            QU.T, a, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("quad", "m_total", "layout",
                                    "interpret"))
def _fused_mglm_matvec(A, y, Z, V, quad, m_total, layout="sublane",
                       interpret=False):
    m, p = A.shape
    k = V.shape[-1]
    out_dtype = V.dtype
    br = _pick_block_rows_mglm(m, p, k, A.dtype.itemsize)
    pad = (-m) % br
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, p), A.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad, k), y.dtype)])
        Z = jnp.concatenate([Z, jnp.zeros((pad, k), Z.dtype)])
    mp = m + pad
    grid = mp // br
    acc_dtype = jnp.float64 if A.dtype == jnp.float64 else jnp.float32
    scale = float(br) / float(m_total)
    cost = pl.CostEstimate(
        flops=4 * mp * p * k,
        bytes_accessed=mp * p * A.dtype.itemsize,
        transcendentals=mp * k,  # softmax-family quad
    )

    if layout == "lane":
        out = pl.pallas_call(
            _make_kernel(quad, scale, acc_dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((br, p), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((p, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((p, k), out_dtype),
            scratch_shapes=[pltpu.VMEM((p, k), acc_dtype)],
            cost_estimate=cost,
            interpret=interpret,
        )(A, y, Z, V)
        return out

    # sublane layout: k-sized axes ride the 8-padded sublane dimension
    out_t = pl.pallas_call(
        _make_kernel_t(quad, scale, acc_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, br), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, br), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, p), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, p), out_dtype),
        scratch_shapes=[pltpu.VMEM((k, p), acc_dtype)],
        cost_estimate=cost,
        interpret=interpret,
    )(A, y.T, Z.T, V.T)
    return out_t.T


def fused_mglm_matvec(A, y, Z, V, quad):
    """vec-free multi-output GGN matvec: returns Aᵀ·quad·(A·V) as (p, k).

    Falls back to the two-matmul jnp expression when the shapes don't
    fit the kernel or `quad`'s tile rescale contract can't hold. The
    MOGLMSpec quad must be sample-normalized (divide by its input's row
    count — quad over all of A normalizes by A's row count, so the
    kernel rescales its per-tile value by BR/m) — every spec in
    scso_tpu.models.losses is.
    """
    m, p = A.shape
    k = V.shape[-1]
    if not supports_fused_mglm_matvec(m, p, k, A.dtype.itemsize):
        return A.T @ quad(y, Z, A @ V)
    counters.bump("fused_mglm_matvec")
    interpret = jax.default_backend() != "tpu"
    # sublane layout for small k (8-padding instead of 128 — variant A's
    # lane padding measured 8× the useful MXU work at k=16); lane layout
    # once k is a large fraction of 128
    layout = "sublane" if k <= 64 else "lane"
    return _fused_mglm_matvec(A, y, Z, V, quad, m, layout=layout,
                              interpret=interpret)
