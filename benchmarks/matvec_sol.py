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
block_until_ready over the axon tunnel under-reports). Every loop body
must DEPEND on the carry — a loop-invariant pallas_call gets hoisted out
of the fori_loop by XLA and reports physically impossible bandwidth
(observed: 1845 GB/s on an 819 GB/s part).

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


# --- 1. pure-read reduce kernel (bandwidth ceiling) ------------------------


def make_read_kernel():
    def kernel(seed_ref, a_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # seed makes the call carry-dependent (defeats hoisting)
            acc_ref[0, 0] = seed_ref[0, 0]

        acc_ref[0, 0] += jnp.sum(a_ref[:])

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[0, 0] = acc_ref[0, 0]

    @functools.partial(jax.jit, static_argnames=("br",))
    def read_sum(seed, A, br):
        m, n = A.shape
        return pl.pallas_call(
            kernel,
            grid=(m // br,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((br, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        )(seed, A)

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

    def report(name, dt, nbytes=m * n * 4):
        bw = nbytes / dt / 1e9
        results[name] = dict(ms=round(dt * 1e3, 3), GBps=round(bw, 1))
        print(f"{name:34s} {dt*1e3:8.3f} ms   {bw:7.1f} GB/s", flush=True)

    def guard(name, fn):
        try:
            fn()
        except Exception as e:
            results[name] = dict(error=str(e)[:200])
            print(f"{name} FAILED: {str(e)[:160]}", flush=True)

    # 0. XLA reduce (its own streaming bandwidth)
    def exp_xla_sum():
        @jax.jit
        def xla_sum_loop(A):
            def body(i, acc):
                # multiply by a carry-dependent scalar: fuses into the
                # reduce (no temp) but defeats loop-invariant hoisting
                return acc + jnp.sum(A * (1.0 + 0.0 * acc))
            return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        float(jax.block_until_ready(xla_sum_loop(A)))  # compile + warm
        t0 = time.perf_counter()
        float(jax.block_until_ready(xla_sum_loop(A)))
        report("xla A.sum (read ceiling)", (time.perf_counter() - t0) / REPS)

    guard("xla A.sum (read ceiling)", exp_xla_sum)

    # 1. pallas pure-read reduce at several tile sizes (tile_mb is the
    #    per-buffer size; Pallas double-buffers, so VMEM holds 2x)
    read_sum = make_read_kernel()
    for tile_mb in (2, 4, 7):
        name = f"pallas read-reduce ({tile_mb}MB tiles)"

        def exp_read(tile_mb=tile_mb, name=name):
            br = max(128, (tile_mb * 2**20 // (n * 4) // 128) * 128)
            if m % br:
                print(f"{name}: skip (m % br)", flush=True)
                return

            @jax.jit
            def read_loop(A):
                def body(i, acc):
                    seed = acc.reshape(1, 1)
                    return read_sum(seed, A, br)[0, 0]
                return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

            float(jax.block_until_ready(read_loop(A)))
            t0 = time.perf_counter()
            float(jax.block_until_ready(read_loop(A)))
            report(name, (time.perf_counter() - t0) / REPS)

        guard(name, exp_read)

    # 2. XLA two-matmul pair
    def exp_pair():
        pair = loop_fn(lambda A, w, x: A.T @ (w * (A @ x)))
        jax.block_until_ready(pair(A, w, v))
        t0 = time.perf_counter()
        jax.block_until_ready(pair(A, w, v))
        report("xla two-matmul pair", (time.perf_counter() - t0) / REPS)

    guard("xla two-matmul pair", exp_pair)

    # 3/4. fused kernel — default then tile-size sweep (mutates the module
    #      constant; each size is a fresh trace because block_rows changes)
    from scso_tpu.ops.pallas import matvec as mv

    default_mb = mv._TILE_BYTES >> 20
    for tile_mb in (default_mb, 2, 5, 6, 7):
        name = f"fused matvec (tile={tile_mb}MB)"

        def exp_fused(tile_mb=tile_mb, name=name):
            mv._TILE_BYTES = tile_mb * 1024 * 1024
            fused = loop_fn(lambda A, w, x: mv.fused_normal_matvec(A, w, x))
            jax.block_until_ready(fused(A, w, v))
            t0 = time.perf_counter()
            jax.block_until_ready(fused(A, w, v))
            report(name, (time.perf_counter() - t0) / REPS)

        guard(name, exp_fused)
    mv._TILE_BYTES = default_mb * 1024 * 1024

    # 5. bf16-stored A through the fused kernel (CG-operator candidate)
    def exp_bf16():
        Ab = A.astype(jnp.bfloat16)
        fused16 = loop_fn(lambda Ab, w, x: mv.fused_normal_matvec(Ab, w, x))
        jax.block_until_ready(fused16(Ab, w, v))
        t0 = time.perf_counter()
        jax.block_until_ready(fused16(Ab, w, v))
        report("fused matvec bf16 A", (time.perf_counter() - t0) / REPS,
               nbytes=m * n * 2)

    guard("fused matvec bf16 A", exp_bf16)

    payload = dict(metric="matvec_sol", m=m, n=n, gib=round(gib, 3),
                   device=jax.devices()[0].device_kind, results=results)
    out = os.path.join(_HERE, "matvec_sol_results.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
