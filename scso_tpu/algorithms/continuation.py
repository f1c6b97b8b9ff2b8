"""Smoothing/penalty continuation (μ/λ homotopy) as a solver mode.

Gives the reference's dead ``update_mu`` hook
(/root/reference/src/utils/utils.jl:37-39 — defined, never called) a
living counterpart: solve a SEQUENCE of smoothing parameters
μ₀ > μ₁ > … > μ_target (and/or penalty values λ₀ > … > λ_target),
warm-starting every stage from the previous stage's iterate, and give
the final (target) stage the full remaining budget.

Why it can help: the SCORE damping constant M_g = n^((3−ν)/2)·μ^(ν/2−2)·Mh
shrinks as μ grows (ν < 4), so early stages take near-full steps on a
heavily-smoothed — hence better-conditioned — model and make cheap
global progress; the target stage then only has to run the endgame.
λ-continuation is the classic l1-homotopy: larger penalties keep early
iterates sparse so the active set grows monotonically toward the target.

TPU-native execution shape: μ and λ are TRACED leaves (of the smoother
and problem pytrees), so every non-final stage reuses ONE compiled
program — the whole homotopy is `n_stages` dispatches of the same fused
`lax.while_loop` executable plus one final-stage program, exactly the
chained-warm-start pattern of `parallel.sweep.path_waves` and bench.py.
No recompiles along the path.

HAZARD — 'gl' λ-continuation with an over-sparse first stage: the GL
smoother's Hessian diagonal is exactly 0 on a zeroed group, making the
variable-metric prox threshold t = ss·λ/Hr infinite there — a group
that hits exact 0 can never re-enter (the reference's 1./Hr_diag metric
behaves identically). Keep λ₀ moderate enough that the true support
survives every stage; l1/l2 are immune (their smoother Hessians are
strictly positive at 0). See tests/test_continuation.py
``test_gl_oversparse_stage_traps_groups``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from scso_tpu.algorithms.iterate import Options, Solution, solve
from scso_tpu.problems import Problem
from scso_tpu._src.struct import replace as dc_replace


def _concat_histories(parts, has_test):
    """Concatenate per-stage Solution histories, dropping each stage
    boundary's duplicate record (stage i's final record and stage i+1's
    first record are the same iterate)."""
    out = {}
    for key in ("obj", "fval", "pri_res_norm", "rel", "objrel",
                "fvaltest", "times"):
        segs = []
        for i, s in enumerate(parts):
            a = np.asarray(getattr(s, key))
            if i + 1 < len(parts) and a.shape[0] > 0:
                a = a[:-1]
            segs.append(a)
        out[key] = np.concatenate(segs) if segs else np.zeros((0,))
    mv = {}
    for name in parts[-1].metricvals:
        segs = []
        for i, s in enumerate(parts):
            a = np.asarray(s.metricvals[name])
            if i + 1 < len(parts) and a.shape[0] > 0:
                a = a[:-1]
            segs.append(a)
        mv[name] = np.concatenate(segs)
    out["metricvals"] = mv
    return out


def iterate_continuation(method, model: Problem, reg_name: str, h_mu, *,
                         mu_schedule: Optional[Sequence] = None,
                         lam_schedule: Optional[Sequence] = None,
                         stage_epochs: int = 10,
                         metrics: Optional[dict] = None, alpha=None,
                         max_epoch=1000, x_tol=1e-10, f_tol=1e-10,
                         verbose=1, rng_seed=0, stats_every=1,
                         mode="fused") -> Solution:
    """Homotopy solve: anneal μ (and/or λ) to their targets, then finish.

    Args:
      mu_schedule: decreasing smoothing values ENDING at the target
        (the last entry is solved with the full ``max_epoch`` budget;
        earlier entries get ``stage_epochs`` each). ``None`` keeps
        ``h_mu.mu`` throughout.
      lam_schedule: same convention for the penalty; entries may be
        scalars or (for 'gl') the two-λ vectors. ``None`` keeps
        ``model.lam``. When both schedules are given they must have
        equal length (stages advance in lockstep).
      stage_epochs: epoch budget per non-final stage. Small on purpose:
        a stage only needs to hand the next one a better warm start —
        solving a loose-μ model to tolerance is wasted work.

    Every stage solves the TRUE composite problem (the prox uses the
    exact nonsmooth g; μ only shapes the direction/damping), so the
    objective-gap histories are comparable across stages and the
    f_tol stopping test can fire in ANY stage — the homotopy then stops
    early and returns.

    Returns a :class:`Solution` whose histories are the concatenated
    stage histories (boundary duplicates dropped); ``cg_info['stages']``
    records (mu, lam, epochs) per executed stage.
    """
    mus = list(mu_schedule) if mu_schedule is not None else None
    lams = list(lam_schedule) if lam_schedule is not None else None
    if mus is not None and lams is not None and len(mus) != len(lams):
        raise ValueError(
            f"mu_schedule ({len(mus)}) and lam_schedule ({len(lams)}) "
            "must have the same length")
    n_stage = len(mus) if mus is not None else (
        len(lams) if lams is not None else 1)
    if n_stage == 0:
        raise ValueError("empty continuation schedule")

    if metrics:
        names = tuple(sorted(metrics.keys()))
        fns = tuple(metrics[k] for k in names)
    else:
        names, fns = (), ()

    stage_opts = Options(
        max_epoch=stage_epochs, x_tol=x_tol, f_tol=f_tol,
        stats_every=stats_every, verbose=verbose, mode=mode)
    final_opts = Options(
        max_epoch=max_epoch, x_tol=x_tol, f_tol=f_tol,
        stats_every=stats_every, verbose=verbose, mode=mode)

    parts = []
    stages_info = []
    cur = model
    cg_total = 0
    for i in range(n_stage):
        final = i == n_stage - 1
        sm_i = dc_replace(h_mu, mu=jnp.asarray(mus[i], model.x0.dtype)) \
            if mus is not None else h_mu
        if lams is not None:
            cur = dc_replace(cur, lam=jnp.asarray(lams[i],
                                                  model.x0.dtype))
        s = solve(method, cur, reg_name, sm_i,
                  final_opts if final else stage_opts,
                  metric_fns=fns, metric_names=names, alpha=alpha,
                  rng_seed=rng_seed + i)
        parts.append(s)
        cg_total += (s.cg_info or {}).get("total_cg_iters", 0)
        stages_info.append(dict(
            mu=(float(np.ravel(mus[i])[0]) if mus is not None
                else None),
            lam=(np.asarray(lams[i]).tolist() if lams is not None
                 else None),
            epochs=int(s.epochs)))
        if not final:
            # early-stop on the gap only while the PENALTY is already at
            # its target: a λ≠λ_target stage computes obj/obj_star with
            # its own λ, so its relative gap is measured against a
            # different composite objective and can cross f_tol
            # spuriously. μ-only homotopy is safe (the true objective
            # does not depend on μ).
            lam_at_target = lams is None or bool(
                np.all(np.asarray(lams[i]) == np.asarray(lams[-1])))
            gap_fired = bool(np.asarray(s.state.frel) <= f_tol)
            if gap_fired and lam_at_target:
                break
            # warm start the next stage from this stage's device iterate
            # (state.x keeps feature padding; Solution.x is sliced)
            cur = dc_replace(cur, x0=jnp.asarray(s.state.x))

    hist = _concat_histories(
        parts, model.Atest is not None and model.ytest is not None)
    last = parts[-1]
    info = dict(last.cg_info or {})
    info["total_cg_iters"] = cg_total
    info["stages"] = stages_info
    return Solution(
        x=last.x,
        obj=hist["obj"], fval=hist["fval"],
        pri_res_norm=hist["pri_res_norm"],
        fvaltest=hist["fvaltest"], rel=hist["rel"], objrel=hist["objrel"],
        metricvals=hist["metricvals"], times=hist["times"],
        epochs=sum(p.epochs for p in parts),
        model=last.model, cg_info=info, state=last.state,
    )
