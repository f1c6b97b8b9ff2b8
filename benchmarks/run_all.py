"""Full benchmark table: every BASELINE.json config on the current backend.

Emits one JSON line per config plus a human-readable table (SURVEY.md §6:
the reference publishes no numbers, so these are the framework's own
correctness+timing baselines). `bench.py` at the repo root remains the
driver-facing single-line headline benchmark.

Run: python benchmarks/run_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow `python benchmarks/run_all.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scso_tpu.utils.backend import select_backend  # noqa: E402

# a dead TPU tunnel hangs backend init — probe + CPU fallback
select_backend()

import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")
if jax.default_backend() == "tpu":
    # persistent cache matters for the slow remote TPU compiles; on CPU it
    # only produces machine-feature-mismatch warnings
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import scso_tpu as scso
from scso_tpu.models import losses, synthetic


def timeit(fn):
    fn()  # warm-up / compile
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def bench_rosenbrock():
    """Config 1: l1 Rosenbrock, ProxLQNSCORE (README quick start)."""
    x0 = np.array([0.2, -0.5])
    prob = scso.Problem(x0, losses.rosenbrock, 1e-8, dtype=np.float32)
    run = lambda: scso.iterate(
        scso.ProxLQNSCORE(m=10), prob, "l1", scso.PHuberSmootherL1L2(1.0),
        max_epoch=2000, verbose=0)
    dt, sol = timeit(run)
    err = float(np.abs(sol.x - 1.0).max())
    return dict(config="rosenbrock_l1_lqn", seconds=round(dt, 4),
                epochs=sol.epochs, final_err=err, ok=err < 1e-2)


def bench_logistic_100x50():
    """Config 2: 100×50 sparse logistic, ProxNSCORE + ProxGGNSCORE."""
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        100, 50, density=0.3, n_active=8, seed=1234, dtype=np.float32,
        label01=True)
    prob = scso.Problem(
        A, y, x0, losses.logistic01_f, 0.1,
        grad_fx=losses.logistic01_grad, hess_fx=losses.logistic01_hess,
        out_fn=losses.sigmoid_out, grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM, dtype=np.float32)
    out = {}
    ok = True
    for meth, key in [(scso.ProxNSCORE(solver="cg"), "newton"),
                      (scso.ProxGGNSCORE(solver="cg"), "ggn")]:
        run = lambda: scso.iterate(meth, prob, "l1",
                                   scso.PHuberSmootherL1L2(1.0),
                                   max_epoch=200, verbose=0)
        dt, sol = timeit(run)
        out[key] = dict(seconds=round(dt, 4), epochs=sol.epochs,
                        obj=float(sol.obj[-1]))
        # NOTE: Newton and GGN converge to slightly DIFFERENT fixed points
        # by construction (the scaled prox metric uses only the smoother
        # Hessian, so the fixed-point balance depends on the direction
        # operator) — so the check is per-method descent, not agreement.
        ok &= sol.obj[-1] < sol.obj[0]
    return dict(config="sparse_logistic_100x50", **out, ok=bool(ok))


def bench_group_lasso():
    """Config 3: sparse-group lasso with a λ2 path (vmapped sweep)."""
    from scso_tpu.parallel import sweep

    A, y, x_true, x0, groups = synthetic.make_group_lasso_problem(
        50, 100, 10, p_active=0.1, noise_std=0.1, seed=1234, corr=0.5,
        dtype=np.float32)
    prob = scso.Problem(
        A, y, x0, losses.lsq_f, [1e-8, 1.0],
        grad_fx=losses.lsq_grad, out_fn=losses.linear_out,
        loss_fn=losses.lsq_loss, grad_fy=losses.lsq_ggn_residual,
        hess_fy_diag=losses.lsq_ggn_qdiag, sol=x_true, groups=groups,
        glm=losses.LSQ_GLM, dtype=np.float32)
    sm = scso.PHuberSmootherGL(1e-2, prob)
    lam2s = np.logspace(-1, 1, 8).astype(np.float32)
    lam_grid = np.stack([np.full_like(lam2s, 1e-8), lam2s], axis=1)
    run = lambda: sweep(scso.ProxLQNSCORE(), prob, "gl", sm,
                        lam_grid=lam_grid,
                        opts=scso.Options(max_epoch=100, verbose=0))
    dt, res = timeit(run)
    return dict(config="group_lasso_lambda_path_x8", seconds=round(dt, 4),
                mean_epochs=float(res.epochs.mean()),
                ok=bool(np.all(np.isfinite(res.obj))))


def bench_box_qp():
    """Config 4: box-constrained QP, ProxNSCORE + PHuber ind-box."""
    Q, c, x0 = synthetic.make_box_qp(64, seed=1234, dtype=np.float32)
    prob = scso.Problem(Q, c, x0, losses.qp_f, 1e-4,
                        grad_fx=losses.qp_grad, hess_fx=losses.qp_hess,
                        C_set=[-1.0, 1.0], dtype=np.float32)
    run = lambda: scso.iterate(
        scso.ProxNSCORE(), prob, "indbox",
        scso.PHuberSmootherIndBox(-1.0, 1.0, 0.6), alpha=0.8,
        max_epoch=200, verbose=0)
    dt, sol = timeit(run)
    feas = bool(np.all(np.abs(sol.x) <= 1 + 1e-5))
    return dict(config="box_qp_64", seconds=round(dt, 4),
                epochs=sol.epochs, feasible=feas, ok=feas)


def bench_big_sweep(quick=False):
    """Config 5 (single-chip slice): vmapped λ/μ sweep of logistic solves."""
    from scso_tpu.parallel import make_mesh, sweep

    B = 64 if quick else 512
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        2048, 128, density=0.1, n_active=16, seed=7, dtype=np.float32,
        label01=True)
    prob = scso.Problem(A, y, x0, losses.logistic01_f, 0.01,
                        grad_fx=losses.logistic01_grad,
                        hvp_w=losses.logistic01_hvp_w,
                        glm=losses.LOGISTIC01_GLM, dtype=np.float32)
    sm = scso.PHuberSmootherL1L2(1.0)
    lam_grid = np.logspace(-3, -0.5, B).astype(np.float32)
    mesh = make_mesh(axis_names=("batch",)) if len(jax.devices()) > 1 else None
    # stats_every=4: under vmap the two-level stats loop is what makes
    # this amortization real (a k%K cond would lower to select)
    opts = scso.Options(max_epoch=60, verbose=0, stats_every=4)
    meth = scso.ProxNSCORE(solver="cg", ss_type=3)
    run = lambda: sweep(meth, prob, "l1", sm, lam_grid=lam_grid,
                        opts=opts, mesh=mesh)
    dt, res = timeit(run)
    # glmnet-style pathwise warm starting: sorted-λ waves, each warm-
    # started from the previous — same compiled program, W dispatches
    W = 8 if quick else 16
    run_w = lambda: sweep(meth, prob, "l1", sm, lam_grid=lam_grid,
                          opts=opts, mesh=mesh, path_waves=W)
    dtw, resw = timeit(run_w)
    conv = lambda r: float((np.asarray(r.epochs) < 60).mean())
    return dict(config=f"lambda_sweep_x{B}", seconds=round(dt, 4),
                solves_per_s=round(B / dt, 1),
                path_waves_seconds=round(dtw, 4),
                path_waves_solves_per_s=round(B / dtw, 1),
                converged_frac=round(conv(res), 3),
                path_waves_converged_frac=round(conv(resw), 3),
                ok=bool(np.all(np.isfinite(res.obj))
                        and np.all(np.isfinite(resw.obj))))


def bench_multinomial():
    """Multi-output family: matrix-free logits-split GGN-CG (mglm)."""
    from scso_tpu.models.losses import (multinom_f, multinom_grad,
                                        multinom_mglm)
    from scso_tpu.models.synthetic import make_multinomial_data

    m, p, k = 8192, 64, 8
    A, y, x0, _ = make_multinomial_data(m, p, k, seed=11,
                                        dtype=np.float32)
    prob = scso.Problem(A, y, x0, multinom_f, 1e-2,
                        grad_fx=multinom_grad, mglm=multinom_mglm(k),
                        dtype=np.float32)
    sm = scso.PHuberSmootherL1L2(1.0)
    run = lambda: scso.iterate(scso.ProxGGNSCORE(solver="cg"), prob,
                               "l1", sm, alpha=1.0, max_epoch=60,
                               verbose=0)
    dt, sol = timeit(run)
    ok = bool(np.all(np.isfinite(sol.x))
              and sol.obj[-1] < 0.9 * sol.obj[0])
    return dict(config=f"multinomial_{m}x{p}x{k}_mglm_cg",
                seconds=round(dt, 4), epochs=sol.epochs,
                obj=float(sol.obj[-1]), ok=ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    results = []
    for fn in [bench_rosenbrock, bench_logistic_100x50, bench_group_lasso,
               bench_box_qp, bench_multinomial,
               lambda: bench_big_sweep(quick=args.quick)]:
        r = fn()
        results.append(r)
        print(json.dumps(r), flush=True)

    print("\n=== summary (device: %s) ===" % jax.devices()[0].device_kind)
    for r in results:
        secs = r.get("seconds",
                     sum(v["seconds"] for v in r.values()
                         if isinstance(v, dict) and "seconds" in v))
        print(f"  {r['config']:28s} {secs:8.3f}s ok={r['ok']}")
    return results


if __name__ == "__main__":
    main()
