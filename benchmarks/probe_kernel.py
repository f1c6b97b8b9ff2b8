"""Quick TPU probe of the fused matvec at the headline + north-star
shapes — validates VMEM feasibility and speed before a full bench run.

Usage: python benchmarks/probe_kernel.py [--northstar-only]
"""
import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

jax.config.update("jax_default_matmul_precision", "highest")
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from scso_tpu.ops.pallas import matvec as mv

REPS = 50


def probe(m, n, dtype=np.float32):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.random(m).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    gb = m * n * jnp.dtype(dtype).itemsize / 1e9

    @jax.jit
    def run(A, w, v):
        def body(_, x):
            out = mv.fused_normal_matvec(A, w, x)
            return out / jnp.maximum(jnp.linalg.norm(out), 1e-30)
        return lax.fori_loop(0, REPS, body, v)

    try:
        out = run(A, w, v)
        val = float(jnp.sum(out))  # forces completion over the tunnel
        t0 = time.perf_counter()
        out = run(A, w, v)
        val = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / REPS
        # parity vs the two-matmul path
        ref = A.astype(jnp.float32).T @ (w * (A.astype(jnp.float32) @ v))
        got = mv.fused_normal_matvec(A, w, v)
        rel = float(jnp.max(jnp.abs(got - ref)) /
                    jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))
        print(f"{m}x{n} {np.dtype(dtype).name}: {dt*1e3:.3f} ms  "
              f"{gb/dt:.1f} GB/s  rel_err={rel:.2e}", flush=True)
    except Exception as e:
        print(f"{m}x{n} {np.dtype(dtype).name}: FAILED {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--northstar-only", action="store_true")
    a = ap.parse_args()
    if not a.northstar_only:
        probe(524288, 1024)            # headline shape
    probe(196608, 10112)               # north-star shape (padded n)
    if not a.northstar_only:
        probe(524288, 1024, jnp.bfloat16)  # bf16-stored A
