"""Config-5 headline: 4096-instance λ sweep, cold vs pathwise warm waves.

Measures the one-dispatch cold sweep against the glmnet-style
`path_waves` variant (sorted-λ waves, each warm-started from the
previous, one compiled program) on the current backend. Reports wall
time, solves/s, converged fraction, and the mean true-objective
improvement of the warm path.

Env knobs: SWEEP_B (grid size), SWEEP_W (waves), SWEEP_WAVE_CAP (epoch
cap for warm waves; 0 = uncapped), SWEEP_POLISH=1 (finish the wave
result with ONE wide x0_grid dispatch — the recommended pathwise
protocol when dispatch latency is low).
"""

from __future__ import annotations

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

jax.config.update("jax_default_matmul_precision", "highest")
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.parallel import sweep


def main():
    B = int(os.environ.get("SWEEP_B", 4096))
    W = int(os.environ.get("SWEEP_W", 16))
    CAP = int(os.environ.get("SWEEP_WAVE_CAP", 0))  # 0 = uncapped
    POLISH = bool(int(os.environ.get("SWEEP_POLISH", "0")))
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        2048, 128, density=0.1, n_active=16, seed=7, dtype=np.float32,
        label01=True)
    prob = scso.Problem(A, y, x0, losses.logistic01_f, 0.01,
                        grad_fx=losses.logistic01_grad,
                        hvp_w=losses.logistic01_hvp_w,
                        glm=losses.LOGISTIC01_GLM, dtype=np.float32)
    sm = scso.PHuberSmootherL1L2(1.0)
    lam_grid = np.logspace(-3, -0.5, B).astype(np.float32)
    opts = scso.Options(max_epoch=60, verbose=0, stats_every=4)
    meth = scso.ProxNSCORE(solver="cg", ss_type=3)

    run_cold = lambda: sweep(meth, prob, "l1", sm, lam_grid=lam_grid,
                             opts=opts)
    run_warm = lambda: sweep(meth, prob, "l1", sm, lam_grid=lam_grid,
                             opts=opts, path_waves=W,
                             wave_max_epoch=(CAP or None))

    run_cold()  # compile
    t0 = time.perf_counter()
    cold = run_cold()
    t_cold = time.perf_counter() - t0

    def run_warm_full():
        w = run_warm()
        if POLISH:
            # waves give cheap warm starts; ONE wide dispatch from them
            # converges every instance at full batch width
            w = sweep(meth, prob, "l1", sm, lam_grid=lam_grid,
                      opts=opts, x0_grid=w.x)
        return w

    run_warm_full()  # compile (Bw-shaped wave program + polish program)
    t0 = time.perf_counter()
    warm = run_warm_full()
    t_warm = time.perf_counter() - t0

    Af, yf = jnp.asarray(A), jnp.asarray(y)

    @jax.jit
    def true_obj(X, lams):
        f = jax.vmap(lambda x: losses.logistic01_f(Af, yf, x))(X)
        return f + lams * jnp.abs(X).sum(axis=1)

    oc = np.asarray(true_obj(jnp.asarray(cold.x), jnp.asarray(lam_grid)))
    ow = np.asarray(true_obj(jnp.asarray(warm.x), jnp.asarray(lam_grid)))
    print(json.dumps({
        "metric": "lambda_sweep_cold_vs_path_waves",
        "B": B, "waves": W, "wave_max_epoch": CAP or None,
        "polish": POLISH,
        "device": jax.devices()[0].device_kind,
        "cold_s": round(t_cold, 3),
        "cold_solves_per_s": round(B / t_cold, 1),
        "warm_s": round(t_warm, 3),
        "warm_solves_per_s": round(B / t_warm, 1),
        "cold_converged_frac": round(float((np.asarray(cold.epochs) < 60).mean()), 3),
        # vs the cap the reported dispatch ran under: the polish pass is
        # a fresh 60-cap dispatch; bare waves run under CAP (wave 0 cold)
        "warm_converged_frac": round(float(
            (np.asarray(warm.epochs)
             < (60 if POLISH else min(60, CAP or 60))).mean()), 3),
        "cold_mean_epochs": round(float(np.asarray(cold.epochs).mean()), 1),
        "warm_mean_epochs": round(float(np.asarray(warm.epochs).mean()), 1),
        "mean_obj_delta_warm_minus_cold": float((ow - oc).mean()),
        "warm_better_or_equal_frac": round(float((ow <= oc + 1e-7).mean()), 3),
    }))


if __name__ == "__main__":
    main()
