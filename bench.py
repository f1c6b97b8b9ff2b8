"""Headline benchmark: sparse logistic regression time-to-1e-6 objective gap.

Runs the BASELINE.json primary metric on the available accelerator:
ProxGGNSCORE with matrix-free GGN-CG (warm-started, Jacobi-preconditioned,
fused Pallas matvec) + PHuber smoothing + l1 prox on an m×n sparse-design
logistic regression.

Honest metric protocol:
  1. PRESOLVE to the true optimum by chaining warm-started solves until
     the objective stops improving (the chain reuses ONE compiled
     program — only traced leaves change — because fresh XLA programs
     take minutes through the remote TPU compile service).
  2. TIMED: fresh solves from x0 with f_tol=1e-6 measured against that
     optimum; chained in 60-epoch chunks until the gap criterion fires.

The reference publishes no performance numbers (BASELINE.md —
"published": {}), so `vs_baseline` is measured against the north-star
wall-clock budget of 10 s (BASELINE.json: 1e-6 gap in < 10 s):
vs_baseline = 10 / value, i.e. > 1.0 means inside budget.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# A dead axon tunnel HANGS backend init (~30 min of plugin retries)
# rather than erroring — probe and fall back to CPU through the config
# route so the bench still emits its JSON line (the "device" field
# records which backend ran) instead of wedging the driver. Details in
# scso_tpu/utils/backend.py.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scso_tpu.utils.backend import select_backend  # noqa: E402

select_backend()

import numpy as np

import jax
import jax.numpy as jnp

# convergence at 1e-6 needs true f32 matmuls, not the TPU default bf16 passes
jax.config.update("jax_default_matmul_precision", "highest")
if jax.default_backend() == "tpu":
    # TPU-backend compiles go through a remote service and are expensive;
    # persist them across bench runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import scso_tpu as scso
from scso_tpu.algorithms.steps import ggn_step
from scso_tpu.ops.lbfgs_core import init_memory
from scso_tpu.models import losses, synthetic
from scso_tpu._src.struct import replace as dc_replace

# CPU fallback shrinks the default rows 8x: the full 524288x1024 bench
# takes hours on 4 host cores vs <1 min on one v5e; the JSON marks the
# device either way. Explicit BENCH_M always wins.
_default_m = (1 << 19) if jax.default_backend() == "tpu" else (1 << 16)
M = int(os.environ.get("BENCH_M", _default_m))
N = int(os.environ.get("BENCH_N", 1024))
# BENCH_PAD=1: zero-pad ragged n to a 128 multiple at problem build so the
# fused kernels engage (the north-star n = 10^4 is not a 128 multiple)
PAD = bool(int(os.environ.get("BENCH_PAD", "0")))
# BENCH_ADAPTIVE=1: Eisenstat-Walker step-length forcing instead of the
# fixed 3e-4 cg_tol
ADAPTIVE = bool(int(os.environ.get("BENCH_ADAPTIVE", "0")))
# BENCH_LP=1: precision-adaptive CG — attach a bf16 copy of A and run
# loose-forcing epochs' curvature matvecs on it; +A.nbytes/2 HBM.
# Implies BENCH_ADAPTIVE: with the fixed 3e-4 forcing no epoch is ever
# "loose" and the lp path would silently never engage.
LP = bool(int(os.environ.get("BENCH_LP", "0")))
if LP and not ADAPTIVE:
    print("bench: BENCH_LP=1 implies BENCH_ADAPTIVE=1 (fixed forcing "
          "never engages the lp path)", file=sys.stderr)
    ADAPTIVE = True
# BENCH_CURV_ROWS=K: subsampled-curvature CG (exact RHS, strided K-row
# GGN estimate — each CG matvec streams K/M of the data); keep K >> N
CURV_ROWS = int(os.environ.get("BENCH_CURV_ROWS", "0"))
# BENCH_GREEDY=1: greedy SCORE damping — trial the undamped prox step,
# accept on strict composite-objective decrease, damped fallback
# (methods' greedy_alpha; measured ~2x fewer epochs at n = 10^4)
GREEDY = bool(int(os.environ.get("BENCH_GREEDY", "0")))
# BENCH_FUSED_PREP=1: single-pass Pallas GLM epoch prep (z + RHS + Jacobi
# diag in one A read) instead of XLA's three fused passes
FUSED_PREP = bool(int(os.environ.get("BENCH_FUSED_PREP", "0")))
SEED = 7
CHUNK = 60            # epochs per compiled chunk (ONE program for all)
GAP = 1e-6


def build_problem(sol=None):
    # 0/1 labels: the coding the GGN cross-entropy pieces are derived for
    # (the reference's ±1-into-0/1 quirk makes Q indefinite — losses.py)
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        M, N, density=0.05, n_active=64, seed=SEED, dtype=np.float32,
        label01=True)
    return scso.Problem(
        A, y, x0, losses.logistic01_f, 0.01,
        grad_fx=losses.logistic01_grad,
        out_fn=losses.sigmoid_out,
        grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w,
        ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM,
        sol=sol,
        dtype=np.float32,
        pad_features=PAD,
    )


def main():
    # cg_tol=3e-4: inexact-Newton forcing — epochs-to-gap is UNCHANGED down
    # to ~3e-4 while CG iterations drop ~45% (knee measured on the gap-
    # anchored CPU protocol; 1e-3 starts costing epochs)
    method = scso.ProxGGNSCORE(solver="cg", cg_tol=3e-4, cg_maxiter=100,
                               cg_adaptive=ADAPTIVE,
                               cg_lp_tol=(1e-2 if LP else 0.0),
                               curvature_rows=CURV_ROWS,
                               greedy_alpha=GREEDY,
                               use_fused_prep=FUSED_PREP)
    sm = scso.PHuberSmootherL1L2(1.0)
    # stats_every=4: the per-epoch stats pass (full-data fval) is ~half
    # the epoch cost; amortizing it trades ≤3 extra epochs at stop time.
    # alpha=1 (full damped steps): ss=0.5 default costs ~1.7x the epochs
    # on this problem family (SCORE damping alone suffices for GGN here).
    solve_kw = dict(x_tol=1e-12, f_tol=GAP, max_epoch=CHUNK, verbose=0,
                    stats_every=4, alpha=1.0)

    run = lambda p: scso.iterate(method, p, "l1", sm, **solve_kw)

    # --- presolve: chain warm-started chunks to the true optimum ----------
    # x_star=0 ⇒ the f_tol gap criterion cannot fire (obj* = log 2 ≫ gap)
    prob = build_problem()
    if LP:
        prob = scso.with_lp_copy(prob)
    cur = prob
    best = np.inf
    x_opt = None
    for _ in range(12):  # ≤ 720 epochs
        s = run(cur)
        # terminal fixed point anchors the gap target; state.x keeps the
        # on-device (and, under BENCH_PAD, padded) vector — Solution.x is
        # sliced back to n_true and would shape-mismatch the padded prob
        x_opt = s.state.x
        if s.obj[-1] >= best * (1 - 1e-7):
            break
        best = s.obj[-1]
        cur = dc_replace(cur, x0=x_opt)

    # --- timed: fresh solves vs the optimum, chained until gap fires ------
    prob_t = dc_replace(prob, x_star=jnp.asarray(x_opt))
    run(prob_t)  # warm-up (program is compiled; this warms dispatch)

    use_mixed = bool(int(os.environ.get("BENCH_MIXED", "0")))
    coarse_prob = None
    if use_mixed:
        # bf16 coarse phase: A stored narrow (≈3× cheaper matvecs — one
        # native-bf16 MXU pass instead of three 'highest'-precision f32
        # passes), down to a coarse gap, then f32 chunks finish to 1e-6.
        coarse_prob = dc_replace(
            prob_t, A=prob_t.A.astype(jnp.bfloat16))
        run_coarse = lambda p: scso.iterate(
            method, p, "l1", sm, x_tol=1e-12, f_tol=3e-3, max_epoch=CHUNK,
            verbose=0, stats_every=4)
        run_coarse(coarse_prob)  # warm-up/compile

    t_solve = 0.0
    epochs = 0
    cg_total = 0
    cur = prob_t
    prev_gap = np.inf

    if use_mixed:
        ccur = coarse_prob
        for _ in range(6):
            t0 = time.perf_counter()
            s = run_coarse(ccur)
            t_solve += time.perf_counter() - t0
            epochs += s.epochs
            cg_total += (s.cg_info or {}).get("total_cg_iters", 0)
            gap_now = float(s.objrel[-1])
            if gap_now <= 3e-3 or s.epochs < CHUNK:
                break
            ccur = dc_replace(ccur, x0=s.state.x)
        cur = dc_replace(prob_t, x0=jnp.asarray(s.state.x, jnp.float32))

    for _ in range(12):
        t0 = time.perf_counter()
        s = run(cur)
        t_solve += time.perf_counter() - t0
        epochs += s.epochs
        cg_total += (s.cg_info or {}).get("total_cg_iters", 0)
        gap_now = float(s.objrel[-1])
        if gap_now <= GAP:
            break
        # an x-stall mid-chunk is NOT convergence to the gap target —
        # restart (fresh L-BFGS/warm state) like the presolve chain does;
        # stop only when restarts stop helping (f32 floor)
        if s.epochs < CHUNK and gap_now >= prev_gap * 0.99:
            break
        prev_gap = gap_now
        cur = dc_replace(cur, x0=s.state.x)
    gap = float(s.objrel[-1])
    iters_per_s = epochs / t_solve

    # --- GGN-CG step latency ---------------------------------------------
    # NOTE: prob must be a jit ARGUMENT — closing over it bakes the 2 GiB
    # data matrix into the HLO as a constant and chokes compilation.
    mem = init_memory(N, 1, np.float32)

    @jax.jit
    def step(p, x):
        return ggn_step(method, p, "l1", sm, p.A, p.y, x, x,
                        jnp.zeros_like(x), jnp.int32(2), mem).x_new

    x = jnp.asarray(prob.x0)
    jax.block_until_ready(step(prob_t, x))
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        x = step(prob_t, x)
    jax.block_until_ready(x)
    ms_per_step = (time.perf_counter() - t0) / n_rep * 1e3

    # fused-kernel engagement: on TPU the hot path MUST have routed through
    # the Pallas kernels (round-1 regression: n % 128 != 0 silently fell
    # back to the two-matmul path and nobody measured what they thought)
    from scso_tpu.ops.pallas.counters import KERNEL_HITS
    if jax.default_backend() == "tpu":
        assert KERNEL_HITS["fused_normal_matvec"] > 0, (
            f"fused matvec never engaged at {M}x{prob.A.shape[1]} — "
            "shape fell back to the XLA path; fix the shape or pad")
        assert KERNEL_HITS["fused_score_update"] > 0, (
            "fused SCORE update never engaged")

    print(json.dumps({
        "metric": "sparse_logreg_time_to_1e-6_obj_gap",
        "value": round(t_solve, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / t_solve, 2),
        "config": (f"{M}x{N}" + ("(pad)" if PAD else "") + " "
                   + ("bf16+f32 mixed" if use_mixed else "f32")
                   + ("+EWforcing" if ADAPTIVE else "")
                   + ("+greedy" if GREEDY else "")
                   + ("+lpCG" if LP else "")
                   + (f"+curv{CURV_ROWS}" if CURV_ROWS else "")
                   + ", ProxGGNSCORE(cg), PHuberL1L2(mu=1)"),
        "device": jax.devices()[0].device_kind,
        "epochs": int(epochs),
        "iters_per_s": round(iters_per_s, 2),
        "ggn_cg_step_ms": round(ms_per_step, 2),
        "total_cg_iters": int(cg_total),
        "final_rel_obj_gap": gap,
        "fused_kernel_hits": dict(KERNEL_HITS),
    }))


if __name__ == "__main__":
    main()
