"""Headline benchmark: sparse logistic regression time-to-1e-6 objective gap.

Runs the BASELINE.json primary metric on the available accelerator:
ProxGGNSCORE with matrix-free GGN-CG (jvp/vjp products, Jacobi
preconditioning) + PHuber smoothing + l1 prox on an m×n sparse-design
logistic regression, measuring wall-clock to a 1e-6 relative objective
gap against a high-accuracy presolve, plus iterations/s and GGN-CG step
latency.

The reference publishes no performance numbers (BASELINE.md — "published":
{}), so `vs_baseline` is measured against the north-star wall-clock budget
of 10 s (BASELINE.json: 1e-6 gap in < 10 s): vs_baseline = 10 / value,
i.e. > 1.0 means inside budget.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# convergence at 1e-6 needs true f32 matmuls, not the TPU default bf16 passes
jax.config.update("jax_default_matmul_precision", "highest")
# TPU-backend compiles of the fused while_loop are expensive over the
# device tunnel (~2 min); persist them across bench runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import scso_tpu as scso
from scso_tpu.algorithms.steps import ggn_step
from scso_tpu.ops.lbfgs_core import init_memory
from scso_tpu.models import losses, synthetic
from scso_tpu._src.struct import replace as dc_replace

M, N = 1 << 19, 1024  # 524288 × 1024 dense design, ~2 GiB f32
SEED = 7


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
        sol=sol,
        dtype=np.float32,
    )


def main():
    method = scso.ProxGGNSCORE(solver="cg", cg_tol=1e-8, cg_maxiter=100)
    sm = scso.PHuberSmootherL1L2(1.0)

    # --- presolve: high-accuracy optimum for the gap target ---------------
    # Uses the SAME Options as the timed run (one compile): with x_star=0
    # the f_tol gap criterion can't trigger (obj* = log 2 vs obj* ≈ 0.5),
    # so the presolve runs to x_tol / epoch-cap accuracy.
    solve_kw = dict(x_tol=1e-12, f_tol=1e-6, max_epoch=60, verbose=0)
    prob = build_problem()
    pre = scso.iterate(method, prob, "l1", sm, **solve_kw)
    x_opt = pre.x

    # --- timed solve: stop exactly at 1e-6 relative objective gap ---------
    prob = dc_replace(prob, x_star=jnp.asarray(x_opt))
    run = lambda: scso.iterate(method, prob, "l1", sm, **solve_kw)
    run()  # warm-up
    t0 = time.perf_counter()
    sol = run()
    t_solve = time.perf_counter() - t0
    iters_per_s = sol.epochs / t_solve
    gap = float(sol.objrel[-1])

    # --- GGN-CG step latency ---------------------------------------------
    # NOTE: prob must be a jit ARGUMENT — closing over it bakes the 2 GiB
    # data matrix into the HLO as a constant and chokes compilation.
    mem = init_memory(N, 1, np.float32)

    @jax.jit
    def step(p, x):
        return ggn_step(method, p, "l1", sm, p.A, p.y, x, x,
                        jnp.zeros_like(x), jnp.int32(2), mem).x_new

    x = jnp.asarray(prob.x0)
    jax.block_until_ready(step(prob, x))
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        x = step(prob, x)
    jax.block_until_ready(x)
    ms_per_step = (time.perf_counter() - t0) / n_rep * 1e3

    print(json.dumps({
        "metric": "sparse_logreg_time_to_1e-6_obj_gap",
        "value": round(t_solve, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / t_solve, 2),
        "config": f"{M}x{N} f32, ProxGGNSCORE(cg), PHuberL1L2(mu=1)",
        "device": jax.devices()[0].device_kind,
        "epochs": int(sol.epochs),
        "iters_per_s": round(iters_per_s, 2),
        "ggn_cg_step_ms": round(ms_per_step, 2),
        "final_rel_obj_gap": gap,
    }))


if __name__ == "__main__":
    main()
