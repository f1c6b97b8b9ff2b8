"""A/B measurement: precision-adaptive CG (bf16 bulk) vs plain f32
under the default tightening-only forcing, at a bench shape.

Protocol: one process, programs compiled once, then ALTERNATING timed
solves (control, lp, control, lp, ...) so tunnel dispatch noise hits
both arms equally; report per-arm min/median. Engagement is proven at
the same shape by a zero-poisoned A_lp run (same program, different
data): its trajectory must diverge from the control's.

Env: AB_M / AB_N / AB_PAD (shape), AB_REPS (default 3).
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

M = int(os.environ.get("AB_M", 524288))
N = int(os.environ.get("AB_N", 1024))
PAD = os.environ.get("AB_PAD", "1") == "1"
REPS = int(os.environ.get("AB_REPS", 3))

m_f32 = bench.make_method(False, None, False, 0, None)
m_lp = bench.make_method(False, None, True, 0, None)
sm = scso.PHuberSmootherL1L2(1.0)
kw = dict(x_tol=1e-12, f_tol=1e-6, max_epoch=60, verbose=0,
          stats_every=4, alpha=1.0)

prob = bench.build_problem(M, N, PAD)
prob_lp = scso.with_lp_copy(prob)

# presolve on the control arm
cur = prob; best = np.inf; x_opt = None
for _ in range(12):
    s = scso.iterate(m_f32, cur, "l1", sm, **kw)
    improved = s.obj[-1] < best * (1 - 1e-7)
    if s.obj[-1] < best:
        best = s.obj[-1]; x_opt = s.state.x
    if not improved:
        break
    cur = dc_replace(cur, x0=s.state.x)
p_f32 = dc_replace(prob, x_star=jnp.asarray(x_opt))
p_lp = dc_replace(prob_lp, x_star=jnp.asarray(x_opt))

def timed(method, p):
    t = 0.0; ep = 0; cg = 0; cur = p; gap = np.inf
    for _ in range(12):
        t0 = time.perf_counter()
        s = scso.iterate(method, cur, "l1", sm, **kw)
        t += time.perf_counter() - t0
        ep += s.epochs; cg += (s.cg_info or {}).get("total_cg_iters", 0)
        gap = float(s.objrel[-1])
        if gap <= 1e-6 or s.epochs < 60:
            break
        cur = dc_replace(cur, x0=s.state.x)
    return t, ep, cg, gap

# engagement proof: zero-poisoned copy must diverge from the control
s_ctl = scso.iterate(m_f32, p_f32, "l1", sm, **kw)          # also warms
p_poison = dc_replace(p_lp, A_lp=jnp.zeros_like(p_lp.A_lp))
s_poi = scso.iterate(m_lp, p_poison, "l1", sm, **kw)        # also warms lp program
diverged = (s_ctl.epochs != s_poi.epochs
            or not np.allclose(np.asarray(s_ctl.obj), np.asarray(s_poi.obj),
                               rtol=1e-9, atol=0))
print(f"engagement: poisoned-copy trajectory diverges = {diverged} "
      f"(ctl {s_ctl.epochs} ep obj {float(s_ctl.obj[-1]):.8f} / "
      f"poison {s_poi.epochs} ep obj {float(s_poi.obj[-1]):.8f})", flush=True)

scso.iterate(m_lp, p_lp, "l1", sm, **kw)  # warm the real-lp dispatch

rows = {"f32": [], "lp": []}
for r in range(REPS):
    for name, meth, p in (("f32", m_f32, p_f32), ("lp", m_lp, p_lp)):
        t, ep, cg, gap = timed(meth, p)
        rows[name].append((t, ep, cg, gap))
        print(f"rep {r} {name}: {t:.4f}s epochs={ep} cg={cg} gap={gap:.2e}",
              flush=True)

for name, rs in rows.items():
    ts = sorted(t for t, *_ in rs)
    print(f"{name}: min={ts[0]:.4f}s median={ts[len(ts)//2]:.4f}s "
          f"epochs={rs[0][1]} cg={rs[0][2]}", flush=True)
