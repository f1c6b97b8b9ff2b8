"""Sharded on-disk data IO: build row-sharded device arrays shard-by-shard.

The true north-star data matrix (10⁷×10⁴ f32 = 400 GB, BASELINE.json:5)
cannot be materialized in any single host's RAM before sharding — the
`shard_problem` path (host array → `jax.device_put`) stops working long
before that. This module builds the sharded array directly from an
on-disk ``.npy`` via ``numpy`` memmap + ``jax.make_array_from_callback``:
each host reads ONLY the row slices its addressable devices own (zero-copy
memmap slices → one shard-sized host buffer at a time), which is the
standard multi-host JAX ingestion pattern (every host memmaps the same
file on a shared FS, or its own replica).

The reference's data story is `MLUtils.DataLoader` over an in-memory
matrix (utils/utils.jl:18-25) — single-process, no IO tier. This is the
TPU-native equivalent for the scale the framework targets.

No native code needed: the read path is mmap-bound (the kernel does the
IO); the native tier (`scso_tpu._native`) covers synthesis instead.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scso_tpu.problems import Problem, make_problem
from scso_tpu._src.struct import replace as dc_replace


def save_array(path: str, arr, *, chunk_rows: int = 1 << 16) -> None:
    """Write an array to ``.npy`` incrementally (chunk_rows rows at a
    time), so a generator-backed or memmapped source never needs to be
    resident at once. ``arr`` may be a numpy array, a memmap, or any
    object with ``shape``/``dtype`` and row slicing."""
    shape, dtype = tuple(arr.shape), np.dtype(arr.dtype)
    with open(path, "wb") as fh:
        np.lib.format.write_array_header_2_0(
            fh, dict(descr=np.lib.format.dtype_to_descr(dtype),
                     fortran_order=False, shape=shape))
        if len(shape) == 0:
            fh.write(np.asarray(arr).tobytes())
            return
        for lo in range(0, shape[0], chunk_rows):
            fh.write(np.ascontiguousarray(
                arr[lo:lo + chunk_rows]).tobytes())


def _npy_meta(path: str):
    """(shape, dtype, data_offset) of a ``.npy`` without loading it."""
    with open(path, "rb") as fh:
        version = np.lib.format.read_magic(fh)
        shape, fortran, dtype = np.lib.format._read_array_header(
            fh, version)
        if fortran:
            raise ValueError(f"{path}: fortran-order .npy not supported")
        return shape, dtype, fh.tell()


def _read_rows(path: str, offset: int, file_dtype, row_shape, lo: int,
               hi: int) -> np.ndarray:
    """Read rows [lo, hi) of a C-order .npy into a FRESH heap buffer.

    `np.fromfile` with an explicit offset, NOT a memmap slice: resident
    memmap pages count toward host RSS and are not reliably evicted, so
    streaming a 100-GB file through a memmap can look fully
    host-resident; fromfile buffers are freed as soon as the chunk is
    transferred."""
    row_elems = int(np.prod(row_shape, dtype=np.int64)) if row_shape else 1
    buf = np.fromfile(
        path, dtype=file_dtype, count=(hi - lo) * row_elems,
        offset=offset + lo * row_elems * file_dtype.itemsize)
    return buf.reshape((hi - lo,) + tuple(row_shape))


def load_rows_sharded(path: str, mesh: Mesh, data_axis: str = "data",
                      *, dtype=None,
                      chunk_bytes: Optional[int] = None) -> jax.Array:
    """Load a ``.npy`` as a device array row-sharded over ``mesh[data_axis]``.

    Default path: each addressable shard is read as a memmap slice (host
    RAM high-water mark = one shard, not the array) and transferred
    directly to its device — `jax.make_array_from_callback` with a
    NamedSharding is the canonical multi-host pattern: on a pod, every
    process only reads the rows its local devices own.

    ``chunk_bytes``: bound the host high-water mark BELOW one shard —
    the out-of-core route for shards that are themselves host-RAM-scale
    (e.g. a 4-GiB shard per v5e chip). Each shard is assembled ON ITS
    DEVICE from ~chunk_bytes disk reads (fresh `fromfile` buffers, not
    resident memmap pages), so host RSS stays at one chunk regardless of
    the matrix size; see benchmarks/outofcore_tpu.py for the measured
    RSS assertion.
    """
    shape, file_dt, offset = _npy_meta(path)
    axis_size = mesh.shape[data_axis]
    m = shape[0]
    if m % axis_size != 0:
        raise ValueError(
            f"rows m={m} not divisible by {data_axis!r}={axis_size} "
            "(zero-row padding would rescale 1/m losses; pad the file "
            "explicitly)")
    spec = P(data_axis, *([None] * (len(shape) - 1)))
    sharding = NamedSharding(mesh, spec)
    dt = np.dtype(dtype) if dtype is not None else file_dt

    if chunk_bytes is None:
        mm = np.load(path, mmap_mode="r")

        def cb(index):
            block = mm[index]
            if block.dtype != dt:
                block = block.astype(dt)
            return np.ascontiguousarray(block)

        return jax.make_array_from_callback(shape, sharding, cb)

    row_bytes = max(
        1, int(np.prod(shape[1:], dtype=np.int64)) * file_dt.itemsize)
    chunk_rows = max(1, int(chunk_bytes) // row_bytes)
    import jax.numpy as jnp

    # DONATED shard assembly: an eager `buf.at[lo:hi].set(chunk)` keeps
    # BOTH the old and new shard buffers alive during the scatter — a 2×
    # HBM transient that OOMs once a shard passes half the device memory
    # (the 10⁷×256 = 10.2 GiB single-chip shard, benchmarks/
    # northstar_rows). A jitted dynamic_update_slice with the shard
    # buffer donated updates in place on TPU (donation is a no-op on
    # CPU, where the virtual-mesh shards are test-sized anyway).
    upd = jax.jit(
        lambda b, c, lo: jax.lax.dynamic_update_slice(
            b, c, (lo,) + (jnp.int32(0),) * (c.ndim - 1)),
        donate_argnums=0)

    shards = []
    devs = []
    for dev, index in sharding.addressable_devices_indices_map(
            tuple(shape)).items():
        sl = index[0]
        lo = sl.start or 0
        hi = sl.stop if sl.stop is not None else m
        shard_shape = (hi - lo,) + tuple(shape[1:])
        with jax.default_device(dev):
            buf = jnp.zeros(shard_shape, dt)
        for clo in range(lo, hi, chunk_rows):
            chi = min(clo + chunk_rows, hi)
            block = _read_rows(path, offset, file_dt, shape[1:], clo, chi)
            if block.dtype != dt:
                block = block.astype(dt)
            buf = upd(buf, jax.device_put(block, dev),
                      jnp.int32(clo - lo))
            # SYNC PER CHUNK — without it the whole transfer chain is
            # queued async and every chunk's host source buffer stays
            # pinned until the final sync: host RSS grows to the FULL
            # matrix (measured: 4.97 GiB high-water for a 4.5 GiB load;
            # 0.5 GiB with the sync). One round-trip per chunk is noise
            # next to the disk read + transfer itself.
            buf = jax.block_until_ready(buf)
            del block  # chunk buffer freed before the next read
        shards.append(buf)
        devs.append(dev)
    return jax.make_array_from_single_device_arrays(
        tuple(shape), sharding, shards)


def save_problem_data(dirpath: str, A, y, *, chunk_rows: int = 1 << 16,
                      Atest=None, ytest=None) -> None:
    """Persist a data problem's arrays for sharded loading:
    ``A.npy``/``y.npy`` (+ optional test split) and a manifest."""
    os.makedirs(dirpath, exist_ok=True)
    save_array(os.path.join(dirpath, "A.npy"), A, chunk_rows=chunk_rows)
    save_array(os.path.join(dirpath, "y.npy"), y, chunk_rows=chunk_rows)
    manifest = dict(m=int(A.shape[0]), n=int(A.shape[-1]),
                    dtype=str(np.dtype(A.dtype)),
                    has_test=Atest is not None)
    if Atest is not None:
        save_array(os.path.join(dirpath, "Atest.npy"), Atest,
                   chunk_rows=chunk_rows)
        save_array(os.path.join(dirpath, "ytest.npy"), ytest,
                   chunk_rows=chunk_rows)
    with open(os.path.join(dirpath, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)


def load_problem_rows_sharded(dirpath: str, x0, f, lam, mesh: Mesh,
                              data_axis: str = "data", *,
                              dtype=None, chunk_bytes=None,
                              **problem_kw) -> Problem:
    """Build a row-sharded :class:`Problem` straight from a
    :func:`save_problem_data` directory — the out-of-host-RAM equivalent
    of ``shard_problem(make_problem(A, y, ...), mesh)``: A and y go from
    disk to their devices shard-by-shard and the problem is stamped with
    (mesh, data_axis) so the fused sharded kernels engage.

    ``x0`` (an n-vector) and every other metadata leaf stay host-built
    and replicated as usual — only the data matrix is at "never resident
    on one host" scale.
    """
    with open(os.path.join(dirpath, "manifest.json")) as fh:
        manifest = json.load(fh)
    dt = np.dtype(dtype) if dtype is not None else np.dtype(
        manifest["dtype"])
    A = load_rows_sharded(os.path.join(dirpath, "A.npy"), mesh,
                          data_axis, dtype=dt, chunk_bytes=chunk_bytes)
    y = load_rows_sharded(os.path.join(dirpath, "y.npy"), mesh,
                          data_axis, dtype=dt, chunk_bytes=chunk_bytes)
    kw = dict(problem_kw)
    if manifest.get("has_test"):
        kw.setdefault("Atest", load_rows_sharded(
            os.path.join(dirpath, "Atest.npy"), mesh, data_axis,
            dtype=dt))
        kw.setdefault("ytest", load_rows_sharded(
            os.path.join(dirpath, "ytest.npy"), mesh, data_axis,
            dtype=dt))
    prob = make_problem(A, y, x0, f, lam, dtype=dt, **kw)
    rep = NamedSharding(mesh, P())
    put_rep = lambda a: None if a is None else jax.device_put(a, rep)
    return dc_replace(
        prob,
        x0=put_rep(prob.x0), lam=put_rep(prob.lam),
        x_star=put_rep(prob.x_star),
        L=put_rep(prob.L), lb=put_rep(prob.lb), ub=put_rep(prob.ub),
        mesh=mesh, data_axis=data_axis,
    )
