"""Solve driver: the jitted epoch loop, histories and the Solution record.

TPU-native re-design of the reference driver (`iterate!`/`optim_loop!`,
/root/reference/src/algorithms/iterate.jl:56-267):

  * the epoch loop is a single `lax.while_loop` on device ("fused" mode)
    carrying (x, x_prev, gradient caches, L-BFGS memory, history buffers)
    — no host round-trips between iterations;
  * histories are preallocated (max_epoch+1)-sized device buffers with a
    record counter (the reference pushes into growing Julia vectors);
  * stopping reproduces the reference's triple test at both loop levels
    (iterate.jl:234,257): ‖x⁺−x‖ < x_tol·max(‖x‖,1), relative objective
    gap ≤ f_tol, or primal residual < x_tol;
  * an instrumented "timed" python-loop mode shares the same jitted step
    and records true per-epoch wall-clock times (the reference's
    `Dates.now()` deltas, iterate.jl:184-186) plus arbitrary host metrics.

Histories/semantics parity notes:
  * records are taken at x_0 … x_{k-1} plus a final record at the
    terminating iterate, matching the reference's converged-exit sequence
    (iterate.jl:189-202, 236-250). On max-epoch exit the reference
    duplicates the last pre-step record and never records the final x
    (iterate.jl:222-232); we record the final x instead — strictly more
    informative.
  * `obj_star` is measured against the user-supplied `sol` (default
    zeros) exactly like iterate.jl:179 — a deliberate reproduction of the
    reference's ground-truth convention.
  * `times`: fused mode reports total wall-clock in the last entry
    (README.md:92 documents exactly that convention); timed mode fills
    every entry.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from scso_tpu.algorithms.methods import ProxGGNSCORE, ProxLQNSCORE, ProxNSCORE
from scso_tpu.algorithms.steps import (
    GLMCache, MOGLMCache, StepOut, epoch_cache_enabled, ggn_step,
    lbfgs_step, newton_step, no_glm_cache, prime_glm_cache, _cw,
    _lam_scalar)
from scso_tpu.ops.lbfgs_core import LBFGSMemory, init_memory
from scso_tpu.problems import Problem
from scso_tpu._src.struct import replace as dc_replace


@dataclasses.dataclass(frozen=True)
class Options:
    """Static per-solve configuration — parity: Options (iterate.jl:37-50).

    `comm_rounds` is stored-but-unused in the reference (iterate.jl:45 —
    never read); we keep the field for API parity and likewise ignore it.
    """

    max_epoch: int = 1000
    x_tol: float = 1e-10
    f_tol: float = 1e-10
    stats_every: int = 1  # record histories every K epochs (1 = parity)
    batch_size: Optional[int] = None
    slice_samples: bool = False
    shuffle_batch: bool = True
    local_max_iter: Optional[int] = None
    comm_rounds: int = 100
    verbose: int = 1
    mode: str = "fused"  # 'fused' (on-device while_loop) | 'timed' (python loop)
    # vmap_safe: freeze finished instances in the stats_every>1 inner loop
    # with a where-mask instead of lax.cond. Set automatically by
    # sweep()/solve_fleet(); set it yourself if you vmap `iterate` with
    # stats_every>1 — cond-inside-fori-inside-while miscompiles on the
    # TPU backend at large vmap widths (device fault at B >= ~512 on
    # v5e). Scalar solves keep cond: it genuinely skips post-convergence
    # steps, while the mask would compute and discard them.
    vmap_safe: bool = False


class History(NamedTuple):
    fval: jax.Array
    obj: jax.Array
    rel: jax.Array
    objrel: jax.Array
    prires: jax.Array
    fvaltest: jax.Array          # zeros-filled when no test data
    metrics: jax.Array           # (n_metrics, cap); (0, cap) when none
    n_rec: jax.Array


def pad_history(h: History, cap: int, xp=jnp) -> History:
    """Refit every History buffer to length `cap` along the last axis —
    pad with the field's fill (NaN for prires, 0 elsewhere) or truncate.
    ``n_rec`` is left unchanged. Shared by checkpoint-resume (xp=jnp,
    traced) and sweep wave stacking (xp=np, host) so the per-field fills
    live in exactly one place."""

    def fit(a, fill=0.0):
        pad = cap - a.shape[-1]
        if pad > 0:
            return xp.concatenate(
                [a, xp.full(a.shape[:-1] + (pad,), fill, a.dtype)],
                axis=-1)
        return a[..., :cap] if pad < 0 else a

    return h._replace(
        fval=fit(h.fval), obj=fit(h.obj), rel=fit(h.rel),
        objrel=fit(h.objrel), prires=fit(h.prires, xp.nan),
        fvaltest=fit(h.fvaltest), metrics=fit(h.metrics))


class Carry(NamedTuple):
    x: jax.Array
    x_prev: jax.Array
    gq: jax.Array
    gq_prev: jax.Array
    d_prev: jax.Array   # previous raw direction — CG warm start seed
    cg_total: jax.Array  # cumulative CG iterations across all steps
    bnorm_prev: jax.Array  # EW forcing s_ref: FIRST outer step length
    #                        (NaN until set) — see steps._forcing_tol;
    #                        NOT a CG rhs norm (that variant stalls here)
    frel: jax.Array     # last recorded relative objective gap (stopping)
    k: jax.Array
    pri_res: jax.Array
    done: jax.Array
    mem: LBFGSMemory
    fcache: GLMCache  # epoch-fused greedy prep cache (steps.GLMCache;
    #                   zero-size placeholder when the path is disabled)
    hist: History
    key: jax.Array


@dataclasses.dataclass
class Solution:
    """Result record — field names mirror the reference Solution struct
    (iterate.jl:3-32)."""

    x: Any
    obj: Any
    fval: Any
    pri_res_norm: Any
    fvaltest: Any
    rel: Any
    objrel: Any
    metricvals: dict
    times: Any
    epochs: int
    model: Problem
    cg_info: Optional[dict] = None
    #: full solver state (the while_loop Carry: iterate, gradient caches,
    #: CG warm start, L-BFGS memory, histories, RNG key) — serialize with
    #: utils.checkpoint.save_state, resume via iterate(resume_state=...)
    state: Any = None

    def __repr__(self):
        # compact — the reference silences Solution printing entirely
        # (iterate.jl:34-35); we show a one-line summary instead
        obj = self.obj[-1] if len(self.obj) else float("nan")
        rel = self.rel[-1] if len(self.rel) else float("nan")
        return (f"Solution(epochs={self.epochs}, obj={obj:.6e}, "
                f"rel={rel:.3e}, n={np.asarray(self.x).shape[-1]})")


# ---------------------------------------------------------------------------
# Stats (one record)
# ---------------------------------------------------------------------------


def _stats(prob: Problem, reg_name: str, x, obj_star, x_tol, f_tol,
           metric_fns, fval=None):
    """One epoch's bookkeeping — parity: iterate.jl:189-202.

    ``fval`` short-circuits the full-data objective pass when the caller
    already knows f(x) (the epoch-fused greedy path carries it)."""
    if fval is None:
        fval = prob.f_val(prob.A, prob.y, x)
    obj = fval + prob.reg(reg_name, x)
    x_star = prob.x_star
    if reg_name == "gl":
        # MSE (iterate.jl:194); under feature padding normalize by the
        # TRUE n so padded and unpadded runs report the same rel error
        # (padded coords of x and x_star are both exactly 0)
        n_eff = prob.n_true if prob.n_true is not None else x.shape[-1]
        rel = jnp.sum((x_star - x) ** 2) / n_eff
    else:
        rel = jnp.maximum(
            jnp.linalg.norm(x - x_star)
            / jnp.maximum(jnp.linalg.norm(x_star), 1.0),
            x_tol,
        )
    raw_frel = jnp.abs(obj - obj_star) / jnp.abs(obj_star)
    objrel = jnp.maximum(raw_frel, f_tol)
    if prob.Atest is not None and prob.ytest is not None:
        fvaltest = prob.f_val(prob.Atest, prob.ytest, x)
    else:
        fvaltest = jnp.zeros_like(fval)
    mvals = jnp.stack([fn(prob, x) for fn in metric_fns]) if metric_fns \
        else jnp.zeros((0,), x.dtype)
    return fval, obj, rel, objrel, raw_frel, fvaltest, mvals


def _record(hist: History, fval, obj, rel, objrel, prires, fvaltest, mvals):
    i = hist.n_rec
    return History(
        fval=hist.fval.at[i].set(fval),
        obj=hist.obj.at[i].set(obj),
        rel=hist.rel.at[i].set(rel),
        objrel=hist.objrel.at[i].set(objrel),
        prires=hist.prires.at[i].set(prires),
        fvaltest=hist.fvaltest.at[i].set(fvaltest),
        metrics=hist.metrics.at[:, i].set(mvals),
        n_rec=i + 1,
    )


# ---------------------------------------------------------------------------
# Fused on-device solve
# ---------------------------------------------------------------------------


def _resolve_kernels(method, prob: Problem):
    """Resolve method.kernels='auto' → 'pallas'|'xla' (host-side).

    Pallas kernels are used on a TPU backend with single-device data OR
    data row-sharded via `shard_problem` (which stamps mesh/data_axis so
    the steps can route matvecs through the shard_map'd kernel — a bare
    pallas_call is not GSPMD-partitionable). The XLA path covers CPU
    tests, foreign shardings and vmapped sweeps.
    """
    if method.kernels != "auto":
        return method
    sharded = False
    if prob.A is not None:
        sh = getattr(prob.A, "sharding", None)
        sharded = sh is not None and len(sh.device_set) > 1
    mesh_known = getattr(prob, "mesh", None) is not None
    use = jax.default_backend() == "tpu" and (not sharded or mesh_known)
    return dataclasses.replace(method, kernels="pallas" if use else "xla")


def _effective_L(prob: Problem, alpha):
    """α kwarg overrides L as L = 1/α — parity: iterate.jl:113-115."""
    if alpha is not None:
        return dc_replace(prob, L=jnp.asarray(1.0 / alpha, prob.x0.dtype))
    return prob


# AUTO precision-adaptive CG engages at the measured-win size only: the
# saving is HBM bandwidth on the CG curvature matvecs, so small /
# dispatch-bound problems gain nothing for the copy's memory. 2 GiB =
# the smaller of the two shapes where the 21-23% win was measured
# (benchmarks/lp_ab.py on v5e); CPU-test shapes sit far below it.
_AUTO_LP_MIN_BYTES = 2 * 1024**3
# Multi-output problems amortize the copy harder — the cached mglm
# epoch is ~96% CG matvecs at ~9.5 iters/epoch (benchmarks/
# mglm_audit.py round 5), so the bf16 copy was a measured 27% epoch win
# already at 196608×1024×16 = 0.805 GB (38.8 → 28.3 ms/epoch, identical
# objective and CG counts) — the mglm threshold sits below that shape.
_AUTO_LP_MIN_BYTES_MGLM = 512 * 1024**2


def _auto_lp(method, prob: Problem, opts: Options, reg_name: str = "l1"):
    """Resolve ProxGGNSCORE.auto_lp — maybe attach a bf16 data copy and
    enable precision-adaptive CG at the forcing floor (host-side).

    Measured on v5e (benchmarks/lp_ab.py, 3 alternating reps each):
    196608×10112 1.52 → 1.17 s, 524288×1024 0.47 → 0.37 s, identical
    trajectories (same epochs AND CG iterations both arms) — the bulk
    phase tolerates the bf16 matvec error because the tightening-only
    endgame re-runs f32 and owns the final accuracy. Correctness gates
    mirror where the lp matvec actually acts (steps._lp_matvec /
    steps._mo_lp_matvec): f32, GLM or multi-output GLM, full-batch, CG
    solver, no manual cg_lp_tol, not cg_adaptive. Round 5 widened the
    round-4 fence: row-sharded problems qualify (shard_problem shards
    A_lp alongside A; the per-DEVICE footprint gates the HBM check) and
    so do mglm problems (bf16 copy for the cached curvature matvecs).
    `auto_lp=True` skips only the backend/size/HBM gates (tests); False
    disables.
    """
    auto = getattr(method, "auto_lp", None)
    if auto is False or not isinstance(method, ProxGGNSCORE):
        return method, prob
    if (method.cg_lp_tol != 0.0 or method.cg_adaptive
            or getattr(method, "curvature_rows", 0)):
        return method, prob
    if (not prob.has_data or getattr(prob.A, "ndim", 0) != 2
            or isinstance(prob.A, jax.core.Tracer)
            or getattr(prob, "A_lp", None) is not None):
        return method, prob
    if (prob.glm is None and prob.mglm is None) \
            or jnp.dtype(prob.x0.dtype) != jnp.float32:
        return method, prob
    if opts.batch_size is not None or opts.slice_samples or opts.vmap_safe:
        return method, prob
    from scso_tpu.algorithms.steps import (_cg_tol, _resolve_ggn_solver)
    if _resolve_ggn_solver(method, prob, prob.A, prob.x0) != "cg":
        return method, prob
    mesh = getattr(prob, "mesh", None)
    if mesh is not None and getattr(prob, "data_axis", None) is None:
        return method, prob  # feature-sharded: no lp route (sharding.py)
    if prob.mglm is not None:
        # the mglm lp route lives in the CACHED path only
        # (steps._mo_lp_matvec; the uncached _ggn_cg_direction mglm
        # branch never consumes A_lp) — don't attach a dead copy
        from scso_tpu.algorithms.steps import epoch_cache_enabled
        if not epoch_cache_enabled(method, prob, reg_name, True):
            return method, prob
    if auto is None:
        # measured-win gates: TPU bandwidth regime + HBM headroom for
        # the half-size copy (observed fit: 7.95 GiB A + 3.97 GiB copy
        # on a 16 GiB v5e). On a mesh both A and the copy are
        # row-sharded, so the PER-DEVICE footprint is what must fit.
        if jax.default_backend() != "tpu":
            return method, prob
        ndev = mesh.shape[prob.data_axis] if mesh is not None else 1
        shard_bytes = prob.A.nbytes // ndev
        min_bytes = (_AUTO_LP_MIN_BYTES_MGLM if prob.mglm is not None
                     else _AUTO_LP_MIN_BYTES)
        if shard_bytes < min_bytes:
            return method, prob
        need = shard_bytes * 1.55  # A + copy + workspace slack
        try:
            limit = jax.devices()[0].memory_stats()["bytes_limit"]
            fits = need <= 0.85 * limit
        except Exception:
            fits = shard_bytes <= 8.5 * 1024**3  # the measured-OK size
        if not fits:
            return method, prob
    method = dataclasses.replace(method, cg_lp_tol=_cg_tol(method,
                                                           prob.x0.dtype))
    prob = dc_replace(prob, A_lp=prob.A.astype(jnp.bfloat16))
    return method, prob


def _init_hist(cap: int, n_metrics: int, dtype) -> History:
    z = jnp.zeros((cap,), dtype)
    return History(
        fval=z, obj=z, rel=z, objrel=z,
        prires=jnp.full((cap,), jnp.nan, dtype),
        fvaltest=z,
        metrics=jnp.zeros((n_metrics, cap), dtype),
        n_rec=jnp.int32(0),
    )


def _make_batches(prob: Problem, opts: Options, n_dim: int):
    """Static batching setup — parity: iterate.jl:124-146.

    Returns (n_full_batches, batch_size, remainder_rows) or None for
    full-batch. A non-divisor batch_size yields a final PARTIAL batch of
    `remainder_rows` true data rows — the reference's
    `MLUtils.DataLoader` semantics (utils/utils.jl:18-20, consumed at
    iterate.jl:136-145). Shapes stay static under jit: m and batch_size
    are static, so the remainder size is too — the partial batch is one
    extra compiled step at its own (rem, n) shape, not a dynamic shape.
    slice_samples forces batch_size=1 (iterate.jl:139-141);
    local_max_iter truncates the per-epoch batch list (iterate.jl:145,
    the remainder batch counts as the last list entry); batch priority
    over slice_samples mirrors iterate.jl:128-131.
    """
    if not prob.has_data:
        return None
    m = prob.A.shape[0]
    bs = opts.batch_size
    if bs is not None and opts.slice_samples:
        bs = bs  # prioritize mini-batching (iterate.jl:128-131)
    elif opts.slice_samples:
        bs = 1
    if bs is None or bs >= m:
        return None
    nb, rem = divmod(m, bs)
    if opts.local_max_iter is not None and int(opts.local_max_iter) > 0:
        cap = int(opts.local_max_iter)
        if cap <= nb:
            nb, rem = cap, 0  # remainder batch truncated away
    return nb, bs, rem


def solve(method, prob: Problem, reg_name: str, sm, opts: Options,
          metric_fns: tuple = (), metric_names: tuple = (),
          alpha=None, rng_seed: int = 0, resume_state=None):
    """Run one solve; returns a :class:`Solution`.

    `method`, `reg_name`, `opts` and the metric fns are static; `prob` and
    `sm` are pytrees — so sweeps can vmap over their leaves (λ, μ, data).
    ``resume_state`` is a previously returned ``Solution.state`` (or a
    checkpoint loaded onto one): the solve continues from the exact
    while_loop carry — bit-identical to an uninterrupted run.
    """
    prob = _effective_L(prob, alpha)
    method = _resolve_kernels(method, prob)
    method, prob = _auto_lp(method, prob, opts, reg_name)
    # The AUTO f32 CG floor (3e-4, steps._cg_tol) is the measured knee
    # for ~1e-6 relative objective gaps; a tighter f_tol can hit a
    # forcing-induced outer stall silently (the inexact-CG fixed point
    # sits outside the target gap). Surface that once per process
    # instead of changing the benched default.
    if (hasattr(method, "cg_tol") and method.cg_tol <= 0
            and jnp.dtype(prob.x0.dtype) == jnp.float32
            and 0 < opts.f_tol < 1e-6):
        from scso_tpu.algorithms.steps import _warn_once
        _warn_once(
            "cg-auto-f32-ftol",
            f"f_tol={opts.f_tol:g} is tighter than the ~1e-6 gap regime "
            "the AUTO float32 CG tolerance (3e-4) was measured for — if "
            "the solve stalls short of the target, set cg_tol explicitly "
            "(e.g. sqrt(f_tol)/3) or solve in float64.",
        )
    if opts.mode == "timed":
        return _solve_python(method, prob, reg_name, sm, opts,
                             metric_fns, metric_names, rng_seed=rng_seed,
                             resume_state=resume_state)
    t0 = time.perf_counter()
    carry = _solve_fused(method, prob, reg_name, sm, opts, metric_fns,
                         rng_seed, resume_state)
    # no block_until_ready on the whole carry (per-array syncs are
    # round-trips over a tunneled TPU) — _to_solution's single batched
    # device_get forces completion
    sol = _to_solution(carry, prob, metric_names, 0.0)
    sol.times[-1:] = time.perf_counter() - t0
    return sol


def _solve_fused_impl(method, prob: Problem, reg_name: str, sm,
                      opts: Options, metric_fns, rng_seed,
                      resume: Optional[Carry] = None) -> Carry:
    dt = prob.x0.dtype
    n = prob.x0.shape[-1]
    x_tol = jnp.asarray(opts.x_tol, dt)
    f_tol = jnp.asarray(opts.f_tol, dt)
    cap = opts.max_epoch + 1
    max_epoch = 1 if opts.local_max_iter is not None else opts.max_epoch

    mem_m = method.m if isinstance(method, ProxLQNSCORE) else 1
    mem0 = init_memory(n, mem_m, dt)
    hist0 = _init_hist(cap, len(metric_fns), dt)

    batching = _make_batches(prob, opts, n)
    is_lbfgs = isinstance(method, ProxLQNSCORE)
    cache_grads = is_lbfgs and batching is None
    # epoch-fused greedy path: prime a GLMCache at x0 and let every
    # epoch run cached prep → CG → ONE dual-candidate pass (greedy trial
    # + next epoch's prep + stats objective) — see steps.GLMCache
    use_fcache = epoch_cache_enabled(method, prob, reg_name,
                                     batching is None)

    if use_fcache:
        # obj_star through the SAME evaluation path as the cached
        # history fval: the kernel-accumulated loss and prob.f_val's
        # XLA reduction disagree by a few ULP-sums in f32 — measured
        # ~1e-6..5e-6 relative at bench scale — and a MIXED-path
        # objective gap inherits that offset as a floor, stalling
        # f_tol=1e-6 stopping just above the target (observed: 180
        # epochs of restarts instead of 37). Same-path evaluation
        # cancels the common bias exactly like the reference's
        # same-code f(x)/f(x*) comparison (iterate.jl:179,190).
        obj_star = (prime_glm_cache(method, prob, prob.x_star).loss
                    + prob.reg(reg_name, prob.x_star))
    else:
        obj_star = prob.f_val(prob.A, prob.y, prob.x_star) + prob.reg(
            reg_name, prob.x_star
        )  # parity: iterate.jl:179

    lam = _lam_scalar(prob.lam)
    cw = _cw(prob, reg_name)

    def composite_grad(As, ys, x):
        return prob.grad_f(As, ys, x) + lam * sm.grad(x, cw)

    def do_step(As, ys, x, x_prev, gq, gq_prev, it, mem,
                d_prev, bn_prev, fcache=None) -> StepOut:
        if isinstance(method, ProxNSCORE):
            return newton_step(method, prob, reg_name, sm, As, ys, x,
                               x_prev, gq_prev, it, mem, d_prev=d_prev,
                               bnorm_prev=bn_prev,
                               fcache=fcache if use_fcache else None)
        if isinstance(method, ProxGGNSCORE):
            return ggn_step(method, prob, reg_name, sm, As, ys, x,
                            x_prev, gq_prev, it, mem, d_prev=d_prev,
                            bnorm_prev=bn_prev,
                            fcache=fcache if use_fcache else None)
        return lbfgs_step(method, prob, reg_name, sm, As, ys, x, x_prev,
                          gq_prev, it, mem,
                          gq_cached=gq if cache_grads else None)

    gq0 = (composite_grad(prob.A, prob.y, prob.x0)
           if cache_grads else jnp.zeros_like(prob.x0))

    if resume is not None:
        # Continue from the saved while_loop carry as if never stopped.
        # The saved run ended with a "final record" of the terminating
        # iterate; the resumed loop's next epoch re-records the exact
        # same values, so rewind n_rec by one — histories then bit-match
        # an uninterrupted run. Buffers are refit to the new cap.
        rh = resume.hist
        hist_r = pad_history(rh, cap)._replace(
            n_rec=jnp.maximum(jnp.asarray(rh.n_rec, jnp.int32) - 1, 0))
        x_r = jnp.asarray(resume.x)
        rfc = getattr(resume, "fcache", None)
        if use_fcache:
            m_rows = prob.A.shape[0]
            if prob.mglm is not None:
                want = (m_rows, int(prob.mglm.n_out))
                ok = (rfc is not None and hasattr(rfc, "Z") and
                      tuple(getattr(rfc.Z, "shape", ())) == want)
                cls = MOGLMCache
            else:
                ok = (rfc is not None and hasattr(rfc, "w") and
                      tuple(getattr(rfc.w, "shape", ())) == (m_rows,))
                cls = GLMCache
            if ok:
                fc_r = jax.tree.map(jnp.asarray, cls(*rfc))
            else:
                # saved before the cache existed / with it disabled —
                # re-prime at the resumed iterate
                fc_r = prime_glm_cache(method, prob, x_r)
        else:
            fc_r = no_glm_cache(dt)
        carry0 = Carry(
            x=x_r, x_prev=jnp.asarray(resume.x_prev),
            gq=jnp.asarray(resume.gq),
            gq_prev=jnp.asarray(resume.gq_prev),
            d_prev=jnp.asarray(resume.d_prev),
            cg_total=jnp.asarray(resume.cg_total),
            bnorm_prev=jnp.asarray(resume.bnorm_prev),
            frel=jnp.asarray(resume.frel), k=jnp.asarray(resume.k),
            pri_res=jnp.asarray(resume.pri_res),
            done=jnp.asarray(resume.done),
            mem=jax.tree.map(jnp.asarray, resume.mem), fcache=fc_r,
            hist=hist_r, key=jnp.asarray(resume.key))
    else:
        fc0 = (prime_glm_cache(method, prob, prob.x0) if use_fcache
               else no_glm_cache(dt))
        carry0 = Carry(
            x=prob.x0, x_prev=prob.x0, gq=gq0,
            gq_prev=jnp.zeros_like(prob.x0),
            d_prev=jnp.zeros_like(prob.x0), cg_total=jnp.int32(0),
            bnorm_prev=jnp.asarray(jnp.nan, dt),
            frel=jnp.asarray(jnp.inf, dt),
            k=jnp.int32(0), pri_res=jnp.asarray(jnp.nan, dt),
            done=jnp.asarray(False), mem=mem0, fcache=fc0, hist=hist0,
            key=jax.random.PRNGKey(rng_seed),
        )

    def with_stats(carry: Carry):
        fval, obj, rel, objrel, raw_frel, ftst, mvals = _stats(
            prob, reg_name, carry.x, obj_star, x_tol, f_tol, metric_fns,
            fval=carry.fcache.loss if use_fcache else None,
        )
        if opts.verbose > 1:
            # show_stat!-style block (utils/utils.jl:50-79); Δtime is
            # host-side wall clock and unavailable on-device
            _, label = method.display()
            fields = ("--------------------------------\n"
                      f"Optimizer = {label}\n"
                      "epoch = {k}\nobj = {o}\nfval = {f}\n"
                      "pri_res_norm = {p}\n")
            kw = dict(k=carry.k, o=obj, f=fval, p=carry.pri_res, r=rel)
            if prob.Atest is not None and prob.ytest is not None:
                fields += "fvaltest = {t}\n"
                kw["t"] = ftst
            jax.debug.print(fields + "rel_error = {r}", **kw)
        return _record(carry.hist, fval, obj, rel, objrel,
                       carry.pri_res, ftst, mvals), raw_frel

    def step_epoch(carry: Carry, raw_frel) -> Carry:
        it = carry.k + 1  # 1-based like the reference epoch_t

        if batching is None:
            out = do_step(prob.A, prob.y, carry.x, carry.x_prev,
                          carry.gq, carry.gq_prev, it, carry.mem,
                          carry.d_prev, carry.bnorm_prev,
                          fcache=carry.fcache)
            x, x_prev = out.x_new, carry.x
            gq, gq_prev = out.gq_new, out.gq
            pri, mem, d_prev = out.pri_res_norm, out.mem, out.d
            cg_total = carry.cg_total + out.cg_iters
            bn_prev = out.bnorm
            fcache = out.fcache if use_fcache else carry.fcache
            key = carry.key
        else:
            nb, bs, rem = batching
            m = prob.A.shape[0]
            key, sub = jax.random.split(carry.key)
            if opts.shuffle_batch:
                perm = jax.random.permutation(sub, m)
            else:
                perm = jnp.arange(m)
            Ab = prob.A[perm][: nb * bs].reshape(nb, bs, -1)
            yb = prob.y[perm][: nb * bs].reshape(nb, bs, *prob.y.shape[1:])

            def batch_step(sc, As, ys):
                x, x_prev, gq, gq_prev, d_prev, bn_p, cgt, pri, done, mem = sc

                def live(_):
                    out = do_step(As, ys, x, x_prev, gq, gq_prev, it, mem,
                                  d_prev, bn_p)
                    conv = (
                        (jnp.linalg.norm(out.x_new - x)
                         < x_tol * jnp.maximum(jnp.linalg.norm(x), 1.0))
                        | (raw_frel <= f_tol)
                        | (out.pri_res_norm < x_tol)
                    )
                    return (out.x_new, x, out.gq_new, out.gq, out.d,
                            out.bnorm, cgt + out.cg_iters,
                            out.pri_res_norm, conv, out.mem)

                def frozen(_):
                    return sc

                return lax.cond(done, frozen, live, None)

            sc, _ = lax.scan(
                lambda sc, batch: (batch_step(sc, *batch), None),
                (carry.x, carry.x_prev, carry.gq, carry.gq_prev,
                 carry.d_prev, carry.bnorm_prev, carry.cg_total,
                 carry.pri_res, carry.done, carry.mem),
                (Ab, yb),
            )
            if rem:
                # final PARTIAL batch of true data rows (reference
                # DataLoader semantics): its (rem, n) shape is static, so
                # it is one more compiled step, not a dynamic shape; the
                # per-sample loss normalization sees the true rem length
                # exactly like the reference's short last batch
                A_rem = prob.A[perm[nb * bs:]]
                y_rem = prob.y[perm[nb * bs:]]
                sc = batch_step(sc, A_rem, y_rem)
            (x, x_prev, gq, gq_prev, d_prev, bn_prev, cg_total, pri,
             done_in, mem) = sc
            fcache = carry.fcache  # cache path requires full-batch

        # stopping: parity with the inner+outer triple test
        # (iterate.jl:234, 257)
        conv = (
            (jnp.linalg.norm(x - x_prev)
             < x_tol * jnp.maximum(jnp.linalg.norm(x_prev), 1.0))
            | (raw_frel <= f_tol)
            | (pri < x_tol)
        )
        return Carry(x=x, x_prev=x_prev, gq=gq, gq_prev=gq_prev,
                     d_prev=d_prev, cg_total=cg_total, bnorm_prev=bn_prev,
                     frel=raw_frel,
                     k=carry.k + 1, pri_res=pri, done=conv, mem=mem,
                     fcache=fcache, hist=carry.hist, key=key)

    def cond(carry: Carry):
        return (~carry.done) & (carry.k < max_epoch)

    def gap_now(c: Carry):
        """Per-epoch-exact f_tol gap between stats rounds.

        Without the epoch cache the plain steps of a stats_every round
        reuse the ROUND-START gap (a fresh one costs a full data pass —
        the whole point of the amortization), so a solve can overshoot
        the f_tol target by up to stats_every−1 epochs. WITH the cache
        the current loss is already in the carry, so the exact gap is
        O(n): at the bench protocol (stats_every=4) this recovers up to
        3 epochs per solve for two vector ops."""
        if not use_fcache:
            return c.frel
        obj_now = c.fcache.loss + prob.reg(reg_name, c.x)
        return jnp.abs(obj_now - obj_star) / jnp.abs(obj_star)

    if resume is not None and opts.stats_every > 1:
        # Realign to the round grid. An uninterrupted run records stats
        # at k = 0, K, 2K, ...; a resume from mid-round (k % K != 0)
        # must first finish that round's remaining plain steps — using
        # the SAVED round-start frel already in the carry, exactly as
        # the uninterrupted round would — so subsequent records land on
        # the same epochs and histories bit-match the uninterrupted
        # run. At most K-1 masked steps; a no-op when k is on the grid.
        K = opts.stats_every

        def realign(_, c):
            live = (~c.done) & (c.k < max_epoch) & (c.k % K != 0)
            c2 = step_epoch(c, gap_now(c))
            return jax.tree.map(
                lambda new, old: jnp.where(live, new, old), c2, c)

        carry0 = lax.fori_loop(0, K - 1, realign, carry0)

    if opts.stats_every <= 1:
        def epoch_body(carry: Carry) -> Carry:
            hist, raw_frel = with_stats(carry)
            return step_epoch(carry._replace(hist=hist), raw_frel)

        carry = lax.while_loop(cond, epoch_body, carry0)
    else:
        # Stats (a full data pass for fval) are the other half of the
        # epoch cost; amortize them over stats_every epochs with a TWO-
        # LEVEL loop: stats once per round, then stats_every plain steps.
        # A k%K lax.cond would serve the scalar case, but under vmap a
        # batched-predicate cond lowers to select (BOTH branches run) —
        # the nested loop keeps the amortization real for sweeps/fleets.
        # Stopping still checks every epoch; f_tol uses the round's gap —
        # except with the epoch cache, where gap_now() makes it exact.
        #
        # Two freeze styles for finished instances (see Options.vmap_safe):
        # scalar solves use lax.cond (truly skips post-convergence steps);
        # vmapped solves use an explicit where-mask — under vmap a batched
        # cond runs both branches and selects anyway (identical
        # semantics/cost), while cond-inside-fori-inside-while miscompiles
        # on the TPU backend at large vmap widths (device fault at
        # B >= ~512, observed on v5e; fine at B <= 256 and stats_every=1).
        def round_body(carry: Carry) -> Carry:
            hist, raw_frel = with_stats(carry)
            carry = carry._replace(hist=hist, frel=raw_frel)

            if opts.vmap_safe:
                def inner(_, c):
                    live = (~c.done) & (c.k < max_epoch)
                    c2 = step_epoch(c, gap_now(c))
                    return jax.tree.map(
                        lambda new, old: jnp.where(live, new, old), c2, c)
            else:
                def inner(_, c):
                    return lax.cond(
                        (~c.done) & (c.k < max_epoch),
                        lambda c: step_epoch(c, gap_now(c)),
                        lambda c: c,
                        c,
                    )

            return lax.fori_loop(0, opts.stats_every, inner, carry)

        carry = lax.while_loop(cond, round_body, carry0)

    # final record at the terminating iterate
    fval, obj, rel, objrel, _, ftst, mvals = _stats(
        prob, reg_name, carry.x, obj_star, x_tol, f_tol, metric_fns,
        fval=carry.fcache.loss if use_fcache else None,
    )
    hist = _record(carry.hist, fval, obj, rel, objrel, carry.pri_res,
                   ftst, mvals)
    return carry._replace(hist=hist)


_solve_fused = jax.jit(
    _solve_fused_impl,
    static_argnames=("method", "reg_name", "opts", "metric_fns", "rng_seed"),
)


def _to_solution(carry: Carry, prob: Problem, metric_names, total_time,
                 times=None) -> Solution:
    # ONE batched device→host transfer of the WHOLE carry: separate
    # np.asarray calls each pay a full round-trip (expensive over a
    # tunneled TPU), and keeping the device carry alive in
    # Solution.state would pin its history buffers + L-BFGS memory in
    # HBM for the Solution's lifetime — a slow leak across experiment
    # loops that retain Solutions. The host copy resumes identically
    # (resume re-asserts leaves with jnp.asarray).
    #
    # Multi-process meshes: the epoch cache's m-sized leaves are
    # row-sharded ACROSS processes and cannot be device_get (only
    # fully-addressable or fully-replicated arrays can); drop the cache
    # from the fetched state — resume re-primes it in one A-pass (the
    # shape-mismatch branch of the resume path).
    def _fetchable(a):
        sh = getattr(a, "sharding", None)
        return (sh is None or a.is_fully_addressable
                or sh.is_fully_replicated)

    if not all(_fetchable(l) for l in jax.tree.leaves(carry.fcache)):
        dt = carry.x.dtype
        carry = carry._replace(
            fcache=jax.tree.map(jax.device_get, no_glm_cache(dt)))
    carry = jax.device_get(carry)
    (n_rec_a, x_h, obj_h, fval_h, prires_h, fvaltest_h, rel_h, objrel_h,
     metrics_h, k_h, cg_h) = (
        carry.hist.n_rec, carry.x, carry.hist.obj, carry.hist.fval,
        carry.hist.prires, carry.hist.fvaltest, carry.hist.rel,
        carry.hist.objrel, carry.hist.metrics, carry.k, carry.cg_total)
    n_rec = int(n_rec_a)
    sl = lambda a: np.asarray(a)[:n_rec]
    metricvals = {
        name: np.asarray(metrics_h[i])[:n_rec]
        for i, name in enumerate(metric_names)
    }
    if times is None:
        times = np.zeros((n_rec,))
        if n_rec:
            times[-1] = total_time
    has_test = prob.Atest is not None and prob.ytest is not None
    total_cg = int(cg_h)
    x_out = np.asarray(x_h)
    if prob.n_true is not None:
        x_out = x_out[..., : prob.n_true]  # drop feature padding
    return Solution(
        x=x_out,
        obj=sl(obj_h),
        fval=sl(fval_h),
        pri_res_norm=sl(prires_h),
        fvaltest=sl(fvaltest_h) if has_test else np.zeros((0,)),
        rel=sl(rel_h),
        objrel=sl(objrel_h),
        metricvals=metricvals,
        times=np.asarray(times),
        epochs=int(k_h),
        model=prob,
        cg_info={"total_cg_iters": total_cg} if total_cg else None,
        state=carry,
    )


# ---------------------------------------------------------------------------
# Instrumented python-loop mode (true per-epoch timing, host metrics)
# ---------------------------------------------------------------------------


def _solve_python(method, prob, reg_name, sm, opts, metric_fns,
                  metric_names, rng_seed=0, resume_state=None):
    """Python epoch loop around the jitted step — the observability path.

    Mirrors the reference's host-side loop shape (per-epoch `Dates.now()`
    deltas, verbose printing incl. the verbose>2 per-batch progress ticks
    of iterate.jl:212-218, host metric callbacks). Mini-batching follows
    the same static-shape semantics as fused mode (_make_batches), with
    the reference's inner per-batch stopping test (iterate.jl:234-252).
    """
    dt = prob.x0.dtype
    n = prob.x0.shape[-1]
    mem_m = method.m if isinstance(method, ProxLQNSCORE) else 1
    mem = init_memory(n, mem_m, dt)
    is_lbfgs = isinstance(method, ProxLQNSCORE)
    batching = _make_batches(prob, opts, n)
    cache_grads = is_lbfgs and batching is None
    host_rng = np.random.default_rng(rng_seed)

    obj_star = prob.f_val(prob.A, prob.y, prob.x_star) + prob.reg(
        reg_name, prob.x_star
    )

    # prob is always a jit ARGUMENT below: closing over it would bake the
    # data matrix into the HLO as a constant (GBs shipped to the compiler)
    @jax.jit
    def stats_fn(p, x):
        return _stats(p, reg_name, x, obj_star, opts.x_tol, opts.f_tol, ())

    lam = _lam_scalar(prob.lam)
    cw = _cw(prob, reg_name)

    @jax.jit
    def step_fn(p, As, ys, x, x_prev, gq, gq_prev, it, mem, d_prev,
                bn_prev):
        if isinstance(method, ProxNSCORE):
            return newton_step(method, p, reg_name, sm, As, ys,
                               x, x_prev, gq_prev, it, mem, d_prev=d_prev,
                               bnorm_prev=bn_prev)
        if isinstance(method, ProxGGNSCORE):
            return ggn_step(method, p, reg_name, sm, As, ys,
                            x, x_prev, gq_prev, it, mem, d_prev=d_prev,
                            bnorm_prev=bn_prev)
        return lbfgs_step(method, p, reg_name, sm, As, ys,
                          x, x_prev, gq_prev, it, mem,
                          gq_cached=gq if cache_grads else None)

    @jax.jit
    def grad_fn(p, x):
        return p.grad_f(p.A, p.y, x) + lam * sm.grad(x, cw)

    has_test = prob.Atest is not None and prob.ytest is not None
    if resume_state is not None:
        st = resume_state
        x, x_prev = jnp.asarray(st.x), jnp.asarray(st.x_prev)
        gq, gq_prev = jnp.asarray(st.gq), jnp.asarray(st.gq_prev)
        d_prev = jnp.asarray(st.d_prev)
        bn_prev = jnp.asarray(getattr(st, "bnorm_prev", jnp.nan))
        mem = jax.tree.map(jnp.asarray, st.mem)
        start_epoch = int(st.k) + 1
        pri = float(st.pri_res)
    else:
        x = prob.x0
        x_prev = prob.x0
        gq = grad_fn(prob, x) if cache_grads else jnp.zeros_like(x)
        gq_prev = jnp.zeros_like(x)
        d_prev = jnp.zeros_like(x)
        bn_prev = jnp.asarray(jnp.nan, dt)
        start_epoch = 1
        pri = float("nan")
    recs = {k: [] for k in
            ("fval", "obj", "rel", "objrel", "prires", "fvaltest")}
    mrecs = {name: [] for name in metric_names}
    times = []
    t0 = time.perf_counter()
    epochs = start_epoch - 1
    name, label = method.display()

    def record(xc, pri_c):
        # ONE device_get — per-value np.asarray costs a round-trip each
        # on a tunneled TPU
        fval, obj, rel, objrel, raw_frel, ftst, _ = jax.device_get(
            stats_fn(prob, xc))
        recs["fval"].append(float(fval))
        recs["obj"].append(float(obj))
        recs["rel"].append(float(rel))
        recs["objrel"].append(float(objrel))
        recs["prires"].append(pri_c)
        recs["fvaltest"].append(float(ftst))
        for nm, fn in zip(metric_names, metric_fns):
            mrecs[nm].append(fn(prob, xc))
        times.append(time.perf_counter() - t0)
        if opts.verbose > 1:
            # parity: show_stat! @show block (utils/utils.jl:50-79)
            print("-" * 32)
            print(f"Optimizer = {label}")
            parts = [f"epoch = {epochs}", f"obj = {float(obj)}",
                     f"fval = {float(fval)}", f"pri_res_norm = {pri_c}"]
            if has_test:
                parts.append(f"fvaltest = {float(ftst)}")
            parts += [f"rel_error = {float(rel)}",
                      f"Δtime = {times[-1]:.3f}s"]
            print("\n".join(parts))
            for nm in metric_names:
                print(f"{nm} = {mrecs[nm][-1]}")
        return float(raw_frel)

    conv = False
    for epoch_t in range(start_epoch, opts.max_epoch + 1):
        raw_frel = record(x, pri)
        if batching is None:
            samples = [(prob.A, prob.y)]
        else:
            nb, bs, rem = batching
            m = prob.A.shape[0]
            perm = (host_rng.permutation(m) if opts.shuffle_batch
                    else np.arange(m))[: nb * bs + rem]
            samples = [
                (prob.A[perm[i * bs:(i + 1) * bs]],
                 prob.y[perm[i * bs:(i + 1) * bs]])
                for i in range(nb)
            ]
            if rem:
                # final partial batch — reference DataLoader semantics
                samples.append((prob.A[perm[nb * bs:]],
                                prob.y[perm[nb * bs:]]))
        iend = len(samples)
        for i, (As, ys) in enumerate(samples, start=1):
            if opts.verbose > 2:
                # per-batch progress ticks — parity: iterate.jl:212-218
                if i in (1, iend) or i % 100 == 0:
                    print(f"\n[{i}/{iend}]", end="", flush=True)
                else:
                    print("#", end="", flush=True)
            out = step_fn(prob, As, ys, x, x_prev, gq, gq_prev,
                          jnp.int32(epoch_t), mem, d_prev, bn_prev)
            out = jax.block_until_ready(out)
            x_new = out.x_new
            d_prev = out.d
            bn_prev = out.bnorm
            pri = float(out.pri_res_norm)
            conv = (
                float(jnp.linalg.norm(x_new - x))
                < opts.x_tol * max(float(jnp.linalg.norm(x)), 1.0)
                or raw_frel <= opts.f_tol
                or pri < opts.x_tol
            )
            x, x_prev = x_new, x
            gq, gq_prev = out.gq_new, out.gq
            mem = out.mem
            if conv:
                # inner per-batch stopping test — parity: iterate.jl:234-252
                break
        epochs += 1
        if opts.verbose > 2:
            print("\n" + "-" * 32, flush=True)
        if conv:
            break

    record(x, pri)
    if opts.verbose > 1:
        # parity: show_stat! terminal messages (utils/utils.jl:94-101)
        if conv:
            print("The algorithm terminated after a relative tolerance "
                  f"was reached at epoch {epochs}.")
        else:
            print("The algorithm reached its maximum number of epochs "
                  f"({opts.max_epoch}).")
    arr = lambda k: np.asarray(recs[k])
    return Solution(
        x=(np.asarray(x)[..., : prob.n_true] if prob.n_true is not None
           else np.asarray(x)),
        obj=arr("obj"), fval=arr("fval"), pri_res_norm=arr("prires"),
        fvaltest=arr("fvaltest") if has_test else np.zeros((0,)),
        rel=arr("rel"), objrel=arr("objrel"),
        metricvals={k: np.asarray(v) for k, v in mrecs.items()},
        times=np.asarray(times), epochs=epochs, model=prob,
    )


# ---------------------------------------------------------------------------
# Public API — parity with `iterate!` (iterate.jl:56-76)
# ---------------------------------------------------------------------------


def iterate(method, model: Problem, reg_name: str, h_mu, *,
            metrics: Optional[dict] = None, alpha=None, batch_size=None,
            slice_samples=False, shuffle_batch=True, max_epoch=1000,
            comm_rounds=100, local_max_iter=None, x_tol=1e-10, f_tol=1e-10,
            verbose=1, mode="fused", rng_seed=0,
            stats_every=1, vmap_safe=False, resume_state=None) -> Solution:
    """Run a SCORE solve — the reference's `iterate!` entry point.

    Args mirror iterate.jl:56 (α spelled `alpha`); `mode` selects the
    fused on-device loop or the instrumented python loop. `metrics` maps
    name -> fn(problem, x): jax-traceable in fused mode (recorded on
    device), arbitrary python in timed mode.

    ``method=None`` defaults to ProxLQNSCORE — the reference's
    method-less overload (iterate.jl:78-98) intends this but passes
    `nothing` into a `::ProximalMethod` argument and can never run
    (SURVEY.md §3.2 "dead code"); we implement the intent.
    """
    if method is None:
        method = ProxLQNSCORE()
    opts = Options(
        max_epoch=(1 if local_max_iter is not None else max_epoch),
        x_tol=x_tol, f_tol=f_tol, stats_every=stats_every,
        batch_size=batch_size,
        slice_samples=slice_samples, shuffle_batch=shuffle_batch,
        local_max_iter=local_max_iter, comm_rounds=comm_rounds,
        verbose=verbose, mode=mode, vmap_safe=vmap_safe,
    )
    if metrics:
        names = tuple(sorted(metrics.keys()))
        fns = tuple(metrics[k] for k in names)
    else:
        names, fns = (), ()
    if verbose > 0 and method.ss_type == 1 and model.L is None and alpha is None:
        print("Neither L nor alpha is set for the problem... "
              "Now fixing alpha = 0.5...")
    return solve(method, model, reg_name, h_mu, opts, metric_fns=fns,
                 metric_names=names, alpha=alpha, rng_seed=rng_seed,
                 resume_state=resume_state)
