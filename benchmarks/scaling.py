"""GGN-CG scaling-efficiency harness (BASELINE north star: >80% N-host).

Measures the row-sharded GGN-CG step time at increasing device counts
with the per-device row count FIXED (weak scaling — the north-star
regime: 10⁷ rows spread over a slice). Efficiency = t(1) / t(N) for
fixed per-device work; >0.8 means the psum reductions ride the
interconnect without serializing the matvecs.

On real multi-chip hardware this runs unchanged (devices = all chips,
collectives on ICI/DCN). On a single host (virtual CPU mesh,
JAX_PLATFORMS=cpu) weak-scaling efficiency is MEANINGLESS — all virtual
devices share the same cores, so t(N) grows with total work by
construction. The metric that IS meaningful there is reported as
``sharding_overhead``: t(unsharded, same total size) / t(sharded over N)
— ≥ ~1.0 means GSPMD partitioning + the psum collectives add nothing
over the single-device program; that is the part of >80%-scaling this
environment can validate (the psum payload is (n,) floats — tiny next
to the HBM-bound per-shard matvec, which is why high weak scaling is
expected on real ICI).

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

from scso_tpu.utils.backend import select_backend  # noqa: E402

# a dead TPU tunnel hangs backend init — probe + CPU fallback
select_backend()

import numpy as np
import jax
import jax.numpy as jnp

import scso_tpu as scso
from scso_tpu.algorithms.steps import ggn_step
from scso_tpu.ops.lbfgs_core import init_memory
from scso_tpu.models import losses, synthetic
from scso_tpu.parallel import make_mesh, shard_problem


def step_time(prob, method, sm, reps=20):  # noqa: D103
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
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--json-out", type=str, default=None,
                    help="write the results list to this JSON file")
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
        t_unsharded = step_time(prob, method, sm, reps=args.reps)
        if c > 1:
            mesh = make_mesh((c,), ("data",), devs[:c])
            prob = shard_problem(prob, mesh)
        t = step_time(prob, method, sm, reps=args.reps)
        if t1 is None:
            t1 = t
        eff = t1 / t
        r = dict(devices=c, rows=m, step_ms=round(t * 1e3, 3),
                 weak_scaling_eff=round(eff, 3),
                 unsharded_step_ms=round(t_unsharded * 1e3, 3),
                 sharding_overhead=round(t_unsharded / t, 3))
        results.append(r)
        print(json.dumps(r), flush=True)

    print("\ndevices  rows       step_ms   weak-eff  unsharded_ms  shard-ovh")
    for r in results:
        print(f"{r['devices']:7d}  {r['rows']:9d}  {r['step_ms']:8.3f}"
              f"  {r['weak_scaling_eff']:8.1%}  {r['unsharded_step_ms']:12.3f}"
              f"  {r['sharding_overhead']:9.3f}")
    if args.json_out:
        payload = dict(
            metric="ggn_cg_step_weak_scaling",
            backend=jax.default_backend(),
            device=str(devs[0].device_kind),
            rows_per_device=args.rows_per_device,
            n=args.n,
            results=results,
        )
        with open(args.json_out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {args.json_out}")
    return results


if __name__ == "__main__":
    main()
