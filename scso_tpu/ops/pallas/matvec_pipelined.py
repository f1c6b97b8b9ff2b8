"""Hand-pipelined fused normal-equation matvec.

The grid-based kernel (ops/pallas/matvec.py) pays per-grid-step overhead
x hundreds of steps, capping serial-dependent throughput near 30% of HBM
peak. This variant runs as a SINGLE program that manages its own
double-buffered DMA pipeline (guide pattern "Double Buffering"): A stays
in HBM; two VMEM slots stream row chunks; each iteration starts the next
chunk's copy before computing on the current one.

MEASURED on v5e at 524288x1024 f32: 10.5 ms/matvec vs the grid kernel's
5.8 ms — the row-vector contractions (lane-dim contractions force MXU
relayouts) cost more than the manual pipeline saves. Kept as a working
reference implementation; the grid kernel remains the production path.

Layout note: every vector is carried as a ROW vector (1, X) — column
vectors (X, 1) in VMEM are lane-padded x128 (a 2 MB weight vector would
allocate 256 MB) and their HBM slices violate Mosaic's lane-tiling
alignment. With row vectors all shapes are (1, multiple-of-128):

    t   = v·A_cᵀ            (1, chunk)
    u   = w_c ∘ t           (1, chunk)
    acc += u·A_c            (1, n)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scso_tpu.ops.pallas.matvec import supports_fused_normal_matvec

_CHUNK_BYTES = 6 * 1024 * 1024  # per slot; x2 slots ~ 12 MB VMEM


def _make_kernel(n_chunks: int, chunk_rows: int, acc_dtype):
    def kernel(a_hbm, w_hbm, v_ref, out_ref):
        def body(bufs, wbufs, sems, wsems, acc_ref):
            def get_dma(slot, idx):
                return pltpu.make_async_copy(
                    a_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                    bufs.at[slot],
                    sems.at[slot],
                )

            def get_wdma(slot, idx):
                # (1, chunk) slice along the lane dim — aligned (chunk
                # is a multiple of 128)
                return pltpu.make_async_copy(
                    w_hbm.at[:, pl.ds(idx * chunk_rows, chunk_rows)],
                    wbufs.at[slot],
                    wsems.at[slot],
                )

            get_dma(0, 0).start()
            get_wdma(0, 0).start()
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def loop(idx, _):
                slot = idx % 2
                nxt = (idx + 1) % 2

                @pl.when(idx + 1 < n_chunks)
                def _():
                    get_dma(nxt, idx + 1).start()
                    get_wdma(nxt, idx + 1).start()

                get_dma(slot, idx).wait()
                get_wdma(slot, idx).wait()
                a = bufs[slot].astype(acc_dtype)          # (chunk, n)
                t = jax.lax.dot_general(                  # v·A_cᵀ → (1, chunk)
                    v_ref[:].astype(acc_dtype), a,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
                u = wbufs[slot].astype(acc_dtype) * t     # (1, chunk)
                acc_ref[:] += jax.lax.dot_general(        # u·A_c → (1, n)
                    u, a,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
                return 0

            jax.lax.fori_loop(0, n_chunks, loop, 0)
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

        n = a_hbm.shape[1]
        pl.run_scoped(
            body,
            bufs=pltpu.VMEM((2, chunk_rows, n), a_hbm.dtype),
            wbufs=pltpu.VMEM((2, 1, chunk_rows), w_hbm.dtype),
            sems=pltpu.SemaphoreType.DMA((2,)),
            wsems=pltpu.SemaphoreType.DMA((2,)),
            acc_ref=pltpu.VMEM((1, n), acc_dtype),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pipelined(A, w, v, interpret=False):
    m, n = A.shape
    out_dtype = v.dtype
    chunk_rows = max(
        128, (_CHUNK_BYTES // (n * A.dtype.itemsize) // 128) * 128)
    chunk_rows = min(chunk_rows, max(128, m))
    pad = (-m) % chunk_rows
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, n), A.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    mp = m + pad
    n_chunks = mp // chunk_rows
    acc_dtype = jnp.float64 if A.dtype == jnp.float64 else jnp.float32

    out = pl.pallas_call(
        _make_kernel(n_chunks, chunk_rows, acc_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # A stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # w streamed from HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v (1, n)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), out_dtype),
        interpret=interpret,
    )(A, w.reshape(1, -1), v.reshape(1, -1))
    return out.reshape(-1)


def fused_normal_matvec_pipelined(A, w, v):
    """Aᵀ(w∘(Av)) with a manual double-buffered DMA pipeline."""
    m, n = A.shape
    if not supports_fused_normal_matvec(m, n):
        return A.T @ (w * (A @ v))
    interpret = jax.default_backend() != "tpu"
    return _pipelined(A, w, v, interpret=interpret)
