"""Fused normal-equation matvec kernel: v ↦ Aᵀ·(w ∘ (A·v)).

This is THE hot op of the framework: every Newton-CG iteration computes
∇²f·v = Aᵀ(w∘(Av))/m (weighted GLM Hessian) and every GGN-CG iteration
computes JᵀQJ·v = Aᵀ(d∘(Av)) with d = σ'·q·σ' (J = diag(link')·A for GLM
models) — see scso_tpu.algorithms.steps. XLA lowers this as TWO separate
(m×n) matmuls, reading A from HBM twice per CG iteration; at bench scale
the matvec is bandwidth-bound, so A-traffic is the whole cost.

The Pallas kernel tiles A by row blocks and keeps each tile in VMEM for
both contractions:

    per row-block b:  t_b = A_b · v          (MXU)
                      u_b = w_b ∘ t_b        (VPU)
                      acc += A_bᵀ · u_b      (MXU, accumulated in VMEM)

— ONE HBM read of A per product, i.e. ~2× the speed of the XLA pair.
The accumulator lives in a VMEM scratch across the sequential TPU grid
and is written out once by the last program.

Requires the full (n,) operands (as (1, n) ROW vectors — column layout
tiles T(8,128) and blows VMEM ~100×) and a (block_rows × n) tile in
VMEM; the minimum 128-row tile bounds feasibility at n ≈ 13.9k f32.
`fused_normal_matvec` picks block sizes automatically; infeasible shapes
fall back to the two-matmul jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scso_tpu.ops.pallas import counters

# VMEM budget for ONE A tile (bytes). Pallas double-buffers the streamed
# tile (2× this) and the ~16 MB/core VMEM must also hold w/v/out/acc;
# 4 MB tiles keep the total near 9 MB (a 6 MB tile OOMed at 16.32 MB).
_TILE_BYTES = 4 * 1024 * 1024
_MAX_N = 1 << 18  # (n,) vectors above this blow the VMEM accumulator


def _make_kernel(br: int, acc_dtype):  # br kept for cache keying
    def _kernel(a_ref, w_ref, v_ref, out_ref, acc_ref):
        # LAYOUT RULES (each violation measured as a VMEM OOM or a 2×
        # slowdown at some shape):
        #  * length-n vectors (v, acc, out) are (1, n) ROWS — an (n, 1)
        #    column tiles T(8,128), n/8 four-KB tiles for n values, which
        #    OOMs scoped VMEM at n ≈ 10⁴ (observed 31.9 MB for 6 buffers);
        #  * the n-contractions run on the VPU as broadcast-multiply-
        #    reduces, NOT the MXU — dot_general against a (1, n) row makes
        #    Mosaic materialize a transposed A tile (observed +2×5.18 MB,
        #    OOM even at n = 1024); the kernel is HBM-bandwidth-bound, so
        #    the VPU (~ TFLOP/s) is nowhere near the bottleneck
        #    (~0.5 GFLOP per GB streamed);
        #  * w blocks stay (br, 1) columns: br ≤ 1024 keeps the T(8,128)
        #    padding ≤ 0.5 MB, and the (br, 1) shape is what the lane-
        #    reduced t and the sublane-reduce both want.
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # Tiles are STORED (and DMA'd) in the input dtype — for bf16 A
        # that's the HBM-bandwidth win — and upcast in-register.
        a = a_ref[:].astype(acc_dtype)                # (BR, n) tile
        v = v_ref[:].astype(acc_dtype)                # (1, n)
        t = jnp.sum(a * v, axis=1, keepdims=True)     # A_b·v → (BR, 1)
        u = w_ref[:].astype(acc_dtype) * t            # (BR, 1)
        acc_ref[:] += jnp.sum(a * u, axis=0,          # A_bᵀ·u → (1, n)
                              keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return _kernel


# MEASURED NEGATIVE (round 5, 10002432×128 f32 on v5e): at narrow n the
# kernel LOSES to the XLA two-matmul pair — 24.8 ms/pass (207 GB/s
# A-bytes) vs 16.7 ms (307 GB/s; 571 GB/s ACTUAL HBM for its 2 reads,
# near the ~820 GB/s roof). Cause: the (BR, 1) w block tiles as
# T(8,128) — br/8 four-KB tiles — so its DMA is br×512 bytes vs the
# A tile's br×n×itemsize: at n = 128 f32 the padded w stream EQUALS the
# A tile and the "one-read" kernel actually moves 2× A-bytes at a worse
# schedule. Alternatives were tried and rejected: (a) streaming w as
# zero-padded (BR/128, 128) lane-major blocks needs an in-kernel
# (BR/128, 128)→(BR, 1) relayout that Mosaic cannot lower
# ("infer-vector-layout: unsupported shape cast"); (b) computing both
# contractions on the MXU with lane-major (1, BR) intermediates (the
# mglm variant-B trick at k = 1) is M=1-row-bound — ~8.7 µs per
# contraction per 8192-row tile ≈ 21 ms/pass, still worse than XLA.
# The w-padding overhead ratio is 512/(n·itemsize), so the kernel is
# gated to n·itemsize ≥ _MIN_N_BYTES where the one-read property wins
# (measured at 2500608×512 f32: fused 13.9 ms vs XLA 17.1).
_MIN_N_BYTES = 1024


def _pick_block_rows(m: int, n: int, itemsize: int) -> int:
    # VMEM per element: double-buffered streamed tile (2×itemsize) plus,
    # for narrow dtypes, the in-register f32 upcast copy (4 bytes) — a
    # bf16 tile budgeted on storage alone OOMs scoped VMEM by ~4 MB.
    eff = 2 * itemsize + (4 if itemsize < 4 else 0)
    br = max(128, 2 * _TILE_BYTES // max(1, n * eff))
    # ≤ 2048: the (br, 1) w block pads to br/8 sublane-tiles (br × 0.5 KB
    # per buffer); the cap bounds that at 2 MB double-buffered
    br = min(br, max(128, m), 2048)
    # multiple of 128 so the (BR/128, 128) weight layout stays exact
    return max(128, (br // 128) * 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_normal_matvec(A, w, v, interpret=False):
    m, n = A.shape
    out_dtype = v.dtype
    # Low-precision A (bf16 storage halves HBM traffic): the tile is
    # DMA'd narrow and upcast in-register inside the kernel; w/v stay in
    # their own (usually f32) dtype — their bandwidth is negligible.
    br = _pick_block_rows(m, n, A.dtype.itemsize)
    pad = (-m) % br
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, n), A.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    mp = m + pad
    grid = mp // br
    acc_dtype = jnp.float64 if A.dtype == jnp.float64 else jnp.float32

    out = pl.pallas_call(
        _make_kernel(br, acc_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((1, n), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n,
            bytes_accessed=mp * n * A.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, w.reshape(-1, 1), v.reshape(1, -1))
    return out.reshape(-1)


# scoped-VMEM budget for feasibility (the hardware limit is 16 MB/core;
# leave headroom for Mosaic's own temporaries)
_SCOPED_VMEM = 14 * 1024 * 1024


def supports_fused_normal_matvec(m: int, n: int, itemsize: int = 4) -> bool:
    """Static feasibility check for the fused kernel.

    Requires lane-aligned n and the minimum (128-row) tile plus the
    (1, n) row vectors to fit scoped VMEM — at large n the row count
    clamps to 128 and the tile grows ∝ n (f32 ceiling ≈ n = 13.9k)."""
    if not (0 < n <= _MAX_N and m >= 8 and n % 128 == 0):
        return False
    if n * itemsize < _MIN_N_BYTES:
        # the (br, 1) w stream's T(8,128) padding (512 B/row) rivals the
        # A tile itself at narrow n — measured loser vs the XLA pair
        # (see _MIN_N_BYTES); let XLA run its near-roof two-matmul form
        return False
    eff = 2 * itemsize + (4 if itemsize < 4 else 0)
    br = _pick_block_rows(m, n, itemsize)
    # A tile (double-buffered + upcast) + w column padding (br/8 sublane-
    # tiles × 4 KB × 2 buffers) + (1, n) rows (v, acc, out)
    vmem = br * n * eff + 2 * (br // 8) * 4096 + 4 * (3 * n * 4)
    return vmem <= _SCOPED_VMEM


def fused_normal_matvec(A, w, v):
    """Aᵀ·(w ∘ (A·v)) in one pass over A.

    Falls back to the two-matmul jnp expression when shapes don't fit the
    kernel (huge n, tiny/ragged blocks) or off-TPU (interpret mode is used
    on CPU so tests validate the kernel itself).
    """
    m, n = A.shape
    if not supports_fused_normal_matvec(m, n, A.dtype.itemsize):
        return A.T @ (w * (A @ v))
    counters.bump("fused_normal_matvec")
    interpret = jax.default_backend() != "tpu"
    return _fused_normal_matvec(A, w, v, interpret=interpret)


def fused_normal_matvec_sharded(A, w, v, mesh, data_axis: str = "data",
                                overlap_chunks: int = 1):
    """Row-sharded Aᵀ(w∘(Av)): per-shard fused kernel + one psum.

    The GSPMD partitioner cannot split a pallas_call, so the sharded
    path wraps the kernel in `shard_map`: each device runs the
    single-pass kernel on its row shard and the (n,) partials psum over
    ICI — the multi-host version of the same one-A-read-per-matvec
    property. Falls back per-shard exactly like the unsharded entry.

    ``overlap_chunks > 1`` switches to a comm/compute-overlapped
    schedule: u = w∘(A·v) once, then the second contraction Aᵀu is split
    into `overlap_chunks` output-column chunks whose psums are issued as
    each chunk finishes — XLA's async collectives then overlap chunk c's
    reduction with chunk c+1's matvec. Trade-off: the local shard is
    read twice (the fused one-read property is given up), so this only
    pays when the collective dominates — i.e. DCN-scale meshes with
    large n. At the north-star shape (n = 10⁴ ⇒ 40 KB psum payload) the
    collective is negligible next to the HBM-bound matvec and the
    default single-psum fused path wins; measured weak-scaling numbers
    live in benchmarks/scaling.py.
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis), P()),
        out_specs=P(),
        # pallas out_shapes carry no varying-mesh-axes metadata
        check_vma=False,
    )
    def _shard_fn(As, ws, vs):
        if overlap_chunks <= 1:
            return jax.lax.psum(fused_normal_matvec(As, ws, vs), data_axis)
        n = As.shape[1]
        c = min(overlap_chunks, max(1, n // 128))
        h = -(-n // c)
        u = ws * (As @ vs)
        outs = [
            jax.lax.psum(As[:, i * h: (i + 1) * h].T @ u, data_axis)
            for i in range(c)
        ]
        return jnp.concatenate(outs)

    return _shard_fn(A, w, v)
