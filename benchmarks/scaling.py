"""GGN-CG scaling-efficiency harness (BASELINE north star: >80% N-host).

Measures the row-sharded GGN-CG step time at increasing device counts
with the per-device row count FIXED (weak scaling — the north-star
regime: 10⁷ rows spread over a slice). Efficiency = t(1) / t(N) for
fixed per-device work; >0.8 means the psum reductions ride the
interconnect without serializing the matvecs.

On real multi-chip hardware this runs unchanged (devices = all chips,
collectives on ICI/DCN). On a single host it demonstrates the harness on
the virtual CPU mesh (set JAX_PLATFORMS=cpu; numbers then measure XLA
partitioning overhead, not ICI).

Run: python benchmarks/scaling.py [--rows-per-device 8192] [--n 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

try:
    _HERE = os.path.dirname(os.path.abspath(__file__))
except NameError:  # exec'd without __file__
    _HERE = os.path.join(os.getcwd(), "benchmarks")
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np
import jax
import jax.numpy as jnp

import scso_tpu as scso
from scso_tpu.algorithms.steps import ggn_step
from scso_tpu.ops.lbfgs_core import init_memory
from scso_tpu.models import losses, synthetic
from scso_tpu.parallel import make_mesh, shard_problem


def step_time(prob, method, sm, reps=20):
    n = prob.n
    mem = init_memory(n, 1, prob.x0.dtype)

    @jax.jit
    def step(p, x):
        return ggn_step(method, p, "l1", sm, p.A, p.y, x, x,
                        jnp.zeros_like(x), jnp.int32(2), mem).x_new

    x = jnp.asarray(prob.x0)
    jax.block_until_ready(step(prob, x))
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(prob, x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-device", type=int, default=8192)
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()

    devs = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(devs)]
    method = scso.ProxGGNSCORE(solver="cg", cg_tol=3e-4, cg_maxiter=25)
    sm = scso.PHuberSmootherL1L2(1.0)

    results = []
    t1 = None
    for c in counts:
        m = args.rows_per_device * c
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            m, args.n, density=0.05, n_active=32, seed=3,
            dtype=np.float32, label01=True)
        prob = scso.Problem(
            A, y, x0, losses.logistic01_f, 0.01,
            grad_fx=losses.logistic01_grad,
            glm=losses.LOGISTIC01_GLM, dtype=np.float32)
        if c > 1:
            mesh = make_mesh((c,), ("data",), devs[:c])
            prob = shard_problem(prob, mesh)
        t = step_time(prob, method, sm)
        if t1 is None:
            t1 = t
        eff = t1 / t
        r = dict(devices=c, rows=m, step_ms=round(t * 1e3, 3),
                 weak_scaling_eff=round(eff, 3))
        results.append(r)
        print(json.dumps(r), flush=True)

    print("\ndevices  rows       step_ms   efficiency")
    for r in results:
        print(f"{r['devices']:7d}  {r['rows']:9d}  {r['step_ms']:8.3f}"
              f"  {r['weak_scaling_eff']:.1%}")
    return results


if __name__ == "__main__":
    main()
