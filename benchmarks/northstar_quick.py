"""Focused north-star timed-protocol experiment (reuses bench.py pieces).

Env: NS_CACHE=0/1 (default 1), NS_STATS=k (default 4), NS_GREEDY unset=AUTO.
Prints per-chunk epochs + gap so stall structure is visible.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scso_tpu.utils.backend import select_backend
select_backend()
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import scso_tpu as scso
from scso_tpu._src.struct import replace as dc_replace
sys.path.insert(0, "/root/repo")
import bench

M = int(os.environ.get("NS_M", 196608))
N = int(os.environ.get("NS_N", 10000))
PAD = os.environ.get("NS_PAD", "1") == "1"
cache = None if os.environ.get("NS_CACHE", "1") == "1" else False
greedy = os.environ.get("NS_GREEDY")
greedy = None if greedy is None else bool(int(greedy))
stats = int(os.environ.get("NS_STATS", 4))

lp = os.environ.get("NS_LP", "0") == "1"

method = bench.make_method(False, greedy, lp, 0, None, epoch_cache=cache)
sm = scso.PHuberSmootherL1L2(1.0)
kw = dict(x_tol=1e-12, f_tol=1e-6, max_epoch=60, verbose=0,
          stats_every=stats, alpha=1.0)
run = lambda p: scso.iterate(method, p, "l1", sm, **kw)

prob = bench.build_problem(M, N, PAD)
if lp:
    prob = scso.with_lp_copy(prob)
cur = prob; best = np.inf; x_opt = None
t0 = time.perf_counter()
for i in range(12):
    s = run(cur)
    print(f"presolve chunk {i}: epochs={s.epochs} obj={s.obj[-1]:.10f}",
          flush=True)
    improved = s.obj[-1] < best * (1 - 1e-7)
    if s.obj[-1] < best:
        best = s.obj[-1]; x_opt = s.state.x
    if not improved:
        break
    cur = dc_replace(cur, x0=s.state.x)
print(f"presolve {time.perf_counter()-t0:.1f}s", flush=True)

prob_t = dc_replace(prob, x_star=jnp.asarray(x_opt))
run(prob_t)  # warm
t_solve = 0.0; epochs = 0; cg = 0; cur = prob_t; prev_gap = np.inf
for i in range(12):
    t0 = time.perf_counter()
    s = run(cur)
    t_solve += time.perf_counter() - t0
    epochs += s.epochs
    cg += (s.cg_info or {}).get("total_cg_iters", 0)
    gap_now = float(s.objrel[-1])
    print(f"timed chunk {i}: epochs={s.epochs} gap={gap_now:.3e} "
          f"objrel_tail={[f'{v:.2e}' for v in s.objrel[-6:]]}", flush=True)
    if gap_now <= 1e-6: break
    if s.epochs < 60 and gap_now >= prev_gap * 0.99: break
    prev_gap = gap_now; cur = dc_replace(cur, x0=s.state.x)
print(f"TIMED: {t_solve:.4f}s epochs={epochs} cg={cg} gap={gap_now:.3e} "
      f"ms/epoch={t_solve/max(epochs,1)*1e3:.2f}", flush=True)
