"""Per-component audit of a multi-output (mglm) GGN-CG epoch.

Round-3 verdict Weak #5 / Next #5: `_mo_glm_system` streams A several
times per epoch (Z, gradient pullback, hdiag einsum) with no fused prep
analogue. This measures each component at a bench-scale multinomial
shape (chained dispatches, epoch_audit.py protocol) so the fuse-or-not
decision is a measurement, not a guess:

  z_pass      — Z = A·W                                   (1 A read)
  grad_pass   — vec(Aᵀ·gres(y, Z))                        (1 A read)
  hdiag_pass  — einsum('ic,ij,ij->jc', qdiag_w, A, A)     (1 A read)
  prep_all    — the three above as XLA sees them together (≤3 reads —
                XLA may fuse the Z consumer passes)
  cg_matvec   — vec(Aᵀ·quad(y, Z, A·V)) + λHr∘v           (2 A reads)
  greedy_pass — Z' = A·W_trial + loss_z                   (1 A read)
  full_epoch  — timed-solve seconds/epoch for reference

Run: python benchmarks/mglm_audit.py [--m 196608] [--p 1024] [--k 16]
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
from scso_tpu.models.losses import multinom_f, multinom_grad, multinom_mglm
from scso_tpu.models.synthetic import make_multinomial_data

sys.path.insert(0, _HERE)
from epoch_audit import bench_chained  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=196608)
    ap.add_argument("--p", type=int, default=1024)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()
    m, p, k = args.m, args.p, args.k

    A, y, x0, _ = make_multinomial_data(m, p, k, seed=11,
                                        dtype=np.float32)
    Ad, yd = jnp.asarray(A), jnp.asarray(y)
    g = multinom_mglm(k)
    a_gb = m * p * 4 / 1e9
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.01 * rng.standard_normal(p * k), jnp.float32)
    v = jnp.asarray(rng.standard_normal(p * k), jnp.float32)
    lhr = jnp.full((p * k,), 1e-3, jnp.float32)

    W = lambda xv: xv.reshape(p, k)
    comp = {}
    comp["z_pass"] = (bench_chained(
        lambda xb, Ab: Ab @ W(xb), x, Ad), 1.0)
    comp["grad_pass"] = (bench_chained(
        lambda xb, Ab, yb: (Ab.T @ g.gres(yb, Ab @ W(xb))).reshape(-1),
        x, Ad, yd), 2.0)  # includes the Z pass
    comp["hdiag_pass"] = (bench_chained(
        lambda xb, Ab, yb: jnp.einsum(
            "ic,ij,ij->jc", g.qdiag_w(yb, Ab @ W(xb)), Ab, Ab),
        x, Ad, yd), 2.0)  # includes the Z pass
    comp["prep_all"] = (bench_chained(
        lambda xb, Ab, yb: (lambda Z: (
            (Ab.T @ g.gres(yb, Z)).reshape(-1),
            jnp.einsum("ic,ij,ij->jc", g.qdiag_w(yb, Z), Ab, Ab)))(
                Ab @ W(xb)),
        x, Ad, yd), 3.0)
    comp["cg_matvec"] = (bench_chained(
        lambda vb, Ab, yb, Zb: (
            Ab.T @ g.quad(yb, Zb, Ab @ W(vb))).reshape(-1) + lhr * vb,
        v, Ad, yd, Ad @ W(x)), 2.0)
    from scso_tpu.ops.pallas.mglm_matvec import (
        fused_mglm_matvec, supports_fused_mglm_matvec)
    if supports_fused_mglm_matvec(m, p, k, 4):
        comp["cg_matvec_fused"] = (bench_chained(
            lambda vb, Ab, yb, Zb: fused_mglm_matvec(
                Ab, yb, Zb, W(vb), g.quad).reshape(-1) + lhr * vb,
            v, Ad, yd, Ad @ W(x)), 1.0)
    if getattr(g, "loss_z", None) is not None:
        comp["greedy_pass"] = (bench_chained(
            lambda xb, Ab, yb: g.loss_z(yb, Ab @ W(xb)), x, Ad, yd), 1.0)

    # round-5: the epoch-cached path's dual-candidate prep (the 3-A-read
    # jnp batched form, steps._moglm_pair_prep) — the component the
    # round-4 verdict names as the remaining fusion candidate
    from scso_tpu.algorithms.steps import _moglm_pair_prep
    comp["pair_prep"] = (bench_chained(
        lambda xb, Ab, yb: _moglm_pair_prep(Ab, yb, g, xb,
                                            0.99 * xb)[0][1],
        x, Ad, yd), 3.0)

    rows = {}
    for name, (sec, passes) in comp.items():
        rows[name] = dict(ms=round(sec * 1e3, 3),
                          gb_s=round(a_gb * (passes or 1) / sec, 1),
                          a_passes=passes)

    # reference point: the timed solve's warm per-epoch cost
    prob = scso.Problem(A, y, x0, multinom_f, 1e-3,
                        grad_fx=multinom_grad, mglm=multinom_mglm(k),
                        dtype=np.float32)
    sm = scso.PHuberSmootherL1L2(1.0)
    kw = dict(x_tol=1e-12, f_tol=0.0, max_epoch=40, verbose=0,
              stats_every=4, alpha=1.0)
    for kern in ("xla", "pallas"):
        method = scso.ProxGGNSCORE(solver="cg", cg_maxiter=100,
                                   kernels=kern)
        run = lambda pr: scso.iterate(method, pr, "l1", sm, **kw)
        s = run(prob)  # compile + warm
        t0 = time.perf_counter()
        s = run(prob)
        dt = time.perf_counter() - t0
        cg = (s.cg_info or {}).get("total_cg_iters", 0)
        rows[f"full_epoch_{kern}"] = dict(
            ms=round(dt / max(s.epochs, 1) * 1e3, 3),
            epochs=int(s.epochs),
            cg_iters_per_epoch=round(cg / max(s.epochs, 1), 2))

    print(json.dumps(dict(shape=f"{m}x{p}x{k}", a_gb=round(a_gb, 3),
                          device=jax.devices()[0].device_kind,
                          components=rows)))


if __name__ == "__main__":
    main()
