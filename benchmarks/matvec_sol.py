"""Matvec speed-of-light experiments (VERDICT #3).

Questions, in order:
  1. What read bandwidth can ANY kernel achieve on this chip for a 2 GiB
     stream? (pure-read reduce kernel + XLA's own A.sum() — this is the
     honest speed-of-light reference, not the HBM datasheet number)
  2. Where does the fused normal-matvec sit against that, and do larger
     tiles / compiler hints close the gap?
  3. How fast is the XLA two-matmul pair (the fallback)?

Every variant runs as an in-jit lax.fori_loop of REPS iterations with a
scalar fetched at the end (tunnel-proof timing; see memory notes — host
block_until_ready over the axon tunnel under-reports).

Run on TPU:  python benchmarks/matvec_sol.py [--m 524288] [--n 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

try:
    _HERE = os.path.dirname(os.path.abspath(__file__))
except NameError:
    _HERE = os.path.join(os.getcwd(), "benchmarks")
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_default_matmul_precision", "highest")
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPS = 50


def timed(fn, *args):
    """In-jit loop timing: seconds per iteration."""
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = fn(*args)
    val = float(jnp.sum(out) if hasattr(out, "shape") else out)
    dt = (time.perf_counter() - t0) / REPS
    return dt, val


# --- 1. pure-read reduce kernel (bandwidth ceiling) ------------------------


def make_read_kernel(tile_bytes: int):
    def kernel(a_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0, 0] = jnp.zeros((), jnp.float32)

        acc_ref[0, 0] += jnp.sum(a_ref[:])

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[0, 0] = acc_ref[0, 0]

    @functools.partial(jax.jit, static_argnames=("br",))
    def read_sum(A, br):
        m, n = A.shape
        grid = m // br
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((br, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        )(A)

    return read_sum


# --- experiment harness -----------------------------------------------------


def loop_fn(one_iter):
    """K applications of one_iter with a data dependency chain."""

    @jax.jit
    def run(A, w, v):
        def body(_, carry):
            out = one_iter(A, w, carry)
            # renormalize to keep the chain finite
            return out / jnp.maximum(jnp.linalg.norm(out), 1e-30)

        return lax.fori_loop(0, REPS, body, v)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1 << 19)
    ap.add_argument("--n", type=int, default=1024)
    args = ap.parse_args()
    m, n = args.m, args.n

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    w = jnp.asarray(rng.random(m).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    gib = m * n * 4 / 2**30
    results = {}

    def report(name, dt):
        bw = m * n * 4 / dt / 1e9
        results[name] = dict(ms=round(dt * 1e3, 3), GBps=round(bw, 1))
        print(f"{name:34s} {dt*1e3:8.3f} ms   {bw:7.1f} GB/s", flush=True)

    # 0. XLA reduce (its own streaming bandwidth)
    @jax.jit
    def xla_sum_loop(A, w, v):
        def body(i, acc):
            return acc + jnp.sum(A * (1.0 + 0.0 * acc))
        return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    val = float(jax.block_until_ready(xla_sum_loop(A, w, v)))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    val = float(jax.block_until_ready(xla_sum_loop(A, w, v)))
    report("xla A.sum (read ceiling)", (time.perf_counter() - t0) / REPS)

    # 1. pallas pure-read reduce at several tile sizes
    for tile_mb in (4, 8):
        br = max(128, (2 * tile_mb * 2**20 // (n * 4) // 128) * 128)
        if m % br:
            continue
        read_sum = make_read_kernel(tile_mb)

        @jax.jit
        def read_loop(A, br=br, rs=read_sum):
            def body(i, acc):
                return acc + rs(A, br)[0, 0]
            return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        val = float(jax.block_until_ready(read_loop(A)))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        val = float(jax.block_until_ready(read_loop(A)))
        report(f"pallas read-reduce ({tile_mb}MB/2 tiles)",
               (time.perf_counter() - t0) / REPS)

    # 2. XLA two-matmul pair
    pair = loop_fn(lambda A, w, x: A.T @ (w * (A @ x)))
    t0 = time.perf_counter()
    jax.block_until_ready(pair(A, w, v))
    t0 = time.perf_counter()
    jax.block_until_ready(pair(A, w, v))
    report("xla two-matmul pair", (time.perf_counter() - t0) / REPS)

    # 3. fused kernel — current settings
    from scso_tpu.ops.pallas import matvec as mv

    fused = loop_fn(lambda A, w, x: mv.fused_normal_matvec(A, w, x))
    jax.block_until_ready(fused(A, w, v))
    t0 = time.perf_counter()
    jax.block_until_ready(fused(A, w, v))
    report(f"fused matvec (tile={mv._TILE_BYTES>>20}MB)",
           (time.perf_counter() - t0) / REPS)

    # 4. fused kernel — tile-size sweep (mutates module constant; each
    #    size is a fresh trace because block_rows changes)
    for tile_mb in (2, 5, 6):
        mv._TILE_BYTES = tile_mb * 1024 * 1024
        fused = loop_fn(lambda A, w, x: mv.fused_normal_matvec(A, w, x))
        try:
            jax.block_until_ready(fused(A, w, v))
            t0 = time.perf_counter()
            jax.block_until_ready(fused(A, w, v))
            report(f"fused matvec (tile={tile_mb}MB)",
                   (time.perf_counter() - t0) / REPS)
        except Exception as e:  # VMEM OOM etc.
            print(f"fused tile={tile_mb}MB FAILED: {str(e)[:120]}",
                  flush=True)
    mv._TILE_BYTES = 4 * 1024 * 1024

    # 5. bf16-stored A through the fused kernel (CG-operator candidate)
    Ab = A.astype(jnp.bfloat16)
    fused16 = loop_fn(lambda Ab, w, x: mv.fused_normal_matvec(Ab, w, x))
    jax.block_until_ready(fused16(Ab, w, v))
    t0 = time.perf_counter()
    jax.block_until_ready(fused16(Ab, w, v))
    dt = (time.perf_counter() - t0) / REPS
    results["fused matvec bf16 A"] = dict(
        ms=round(dt * 1e3, 3), GBps=round(m * n * 2 / dt / 1e9, 1))
    print(f"{'fused matvec bf16 A':34s} {dt*1e3:8.3f} ms   "
          f"{m*n*2/dt/1e9:7.1f} GB/s (bf16 bytes)", flush=True)

    payload = dict(metric="matvec_sol", m=m, n=n, gib=round(gib, 3),
                   device=jax.devices()[0].device_kind, results=results)
    out = os.path.join(_HERE, "matvec_sol_results.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
