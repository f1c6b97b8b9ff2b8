"""μ/λ continuation at the bench shapes: measure the trajectory lever.

Round-3 verdict Next #1: both headline shapes are TRAJECTORY-bound (every
per-epoch-cost knob measured negative); the untried lever is smoothing/
penalty continuation. This measures `iterate_continuation` against the
direct solve under the EXACT headline protocol (presolve-anchored gap,
timed chained solves, one compiled program per distinct Options).

Compile economy: the final stage uses the headline's own statics
(max_epoch=60, f_tol=1e-6, x_tol=1e-12, stats_every=4, alpha=1.0, the
no-knob ProxGGNSCORE(cg)) so it hits the persistent cache from bench.py;
only the stage-budget program (max_epoch=stage_epochs) is a fresh
compile, shared by every schedule (μ and λ are traced).

Run: python benchmarks/continuation_tpu.py [--shape northstar|secondary]
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
from scso_tpu._src.struct import replace as dc_replace

SEED = 7
CHUNK = 60
GAP = 1e-6
KW = dict(x_tol=1e-12, f_tol=GAP, max_epoch=CHUNK, verbose=0,
          stats_every=4, alpha=1.0)


def build_problem(M, N, pad):
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        M, N, density=0.05, n_active=64, seed=SEED, dtype=np.float32,
        label01=True)
    return scso.Problem(
        A, y, x0, losses.logistic01_f, 0.01,
        grad_fx=losses.logistic01_grad, out_fn=losses.sigmoid_out,
        grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM, dtype=np.float32, pad_features=pad)


def presolve_anchor(method, prob, sm):
    run = lambda p: scso.iterate(method, p, "l1", sm, **KW)
    cur, best, x_opt = prob, np.inf, None
    for _ in range(12):
        s = run(cur)
        x_opt = s.state.x
        if s.obj[-1] >= best * (1 - 1e-7):
            break
        best = s.obj[-1]
        cur = dc_replace(cur, x0=x_opt)
    return dc_replace(prob, x_star=jnp.asarray(x_opt))


def timed_direct(method, prob_t, sm):
    run = lambda p: scso.iterate(method, p, "l1", sm, **KW)
    run(prob_t)  # warm dispatch
    t, epochs, cur, prev_gap = 0.0, 0, prob_t, np.inf
    for _ in range(12):
        t0 = time.perf_counter()
        s = run(cur)
        t += time.perf_counter() - t0
        epochs += int(s.epochs)
        gap = float(s.objrel[-1])
        if gap <= GAP or (s.epochs < CHUNK and gap >= prev_gap * 0.99):
            break
        prev_gap = gap
        cur = dc_replace(cur, x0=s.state.x)
    return dict(seconds=round(t, 4), epochs=epochs, gap=gap)


def timed_continuation(method, prob_t, sm, mu_sched, lam_sched,
                       stage_epochs):
    runc = lambda p: scso.iterate_continuation(
        method, p, "l1", sm, mu_schedule=mu_sched,
        lam_schedule=lam_sched, stage_epochs=stage_epochs, **KW)
    run = lambda p: scso.iterate(method, p, "l1", sm, **KW)
    runc(prob_t)  # warm dispatch (stage + final programs)
    t, epochs = 0.0, 0
    t0 = time.perf_counter()
    s = runc(prob_t)
    t += time.perf_counter() - t0
    epochs += int(s.epochs)
    gap = float(s.objrel[-1])
    prev_gap = np.inf
    cur = prob_t
    # if the homotopy's final budget ran out, keep chaining direct chunks
    while gap > GAP:
        if gap >= prev_gap * 0.99 and epochs > stage_epochs * 12:
            break
        prev_gap = gap
        cur = dc_replace(cur, x0=s.state.x)
        t0 = time.perf_counter()
        s = run(cur)
        t += time.perf_counter() - t0
        epochs += int(s.epochs)
        gap = float(s.objrel[-1])
    return dict(seconds=round(t, 4), epochs=epochs, gap=gap,
                stages=s.cg_info.get("stages") if s.cg_info else None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="northstar",
                    choices=["northstar", "secondary"])
    ap.add_argument("--stage-epochs", type=int, default=8)
    args = ap.parse_args()

    M, N, pad = ((196608, 10000, True) if args.shape == "northstar"
                 else (1 << 19, 1024, False))
    method = scso.ProxGGNSCORE(solver="cg", cg_maxiter=100)
    sm = scso.PHuberSmootherL1L2(1.0)

    prob = build_problem(M, N, pad)
    prob_t = presolve_anchor(method, prob, sm)

    out = dict(shape=f"{M}x{N}" + ("(pad)" if pad else ""),
               device=jax.devices()[0].device_kind,
               stage_epochs=args.stage_epochs)
    out["direct"] = timed_direct(method, prob_t, sm)
    print(json.dumps(dict(out, experiment="direct")), flush=True)

    experiments = [
        ("mu_4_1", [4.0, 1.0], None),
        ("mu_16_1", [16.0, 1.0], None),
        ("mu_16_4_1", [16.0, 4.0, 1.0], None),
        ("mu_64_8_1", [64.0, 8.0, 1.0], None),
        ("lam_5x", [1.0, 1.0], [0.05, 0.01]),
        ("lam_10x_3", [1.0, 1.0, 1.0], [0.1, 0.03, 0.01]),
        ("joint_mu16_lam5x", [16.0, 1.0], [0.05, 0.01]),
    ]
    for name, mus, lams in experiments:
        res = timed_continuation(method, prob_t, sm, mus, lams,
                                 args.stage_epochs)
        print(json.dumps(dict(shape=out["shape"], experiment=name,
                              **res)), flush=True)


if __name__ == "__main__":
    main()
