"""The three SCORE step rules as pure functions.

Each step maps (x, x_prev, cached gradients, L-BFGS memory) to
(x_new, pri_res_norm, updated caches) for one method:

  * newton_step — parity: step!(::ProxNSCORE, ...)  prox-N-SCORE.jl:34-119
  * ggn_step    — parity: step!(::ProxGGNSCORE, ...) prox-GGN-SCORE.jl:34-135
  * lbfgs_step  — parity: step!(::ProxLQNSCORE, ...) prox-L-BFGS-SCORE.jl:69-169

Shared scaffolding (smoother gradient/Hessian-diagonal, the three
step-size schemes, the self-concordance damping α = ss/(1 + M_g·η) and the
scaled proximal update) is factored here once; the reference repeats it in
each method file.

Deliberate fix vs the reference: the Barzilai–Borwein (ss_type=2) branch
in the reference Newton/GGN steps references an undefined `∇f` and calls
`hμ.grad` with the wrong arity (prox-N-SCORE.jl:81-83,
prox-GGN-SCORE.jl:78-80 — latent MethodErrors). We implement the working
formula from the L-BFGS step (prox-L-BFGS-SCORE.jl:113-118) for all three
methods, per SURVEY.md §7 step 5.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scso_tpu.algorithms.methods import ProxGGNSCORE, ProxLQNSCORE, ProxNSCORE
from scso_tpu.ops.lbfgs_core import LBFGSMemory, two_loop, update_memory
from scso_tpu.ops.linalg import armijo_linesearch, cg_solve, inv_bb_step
from scso_tpu.ops.pallas.glm_prep import fused_glm_prep, fused_glm_prep_pair
from scso_tpu.ops.pallas.matvec import (
    fused_normal_matvec,
    fused_normal_matvec_sharded,
    supports_fused_normal_matvec,
)
from scso_tpu.ops.pallas.mglm_matvec import (
    fused_mglm_matvec,
    supports_fused_mglm_matvec,
)
from scso_tpu.ops.pallas.score_update import (
    fused_score_update,
    supports_fused_update,
)
from scso_tpu.ops.pallas.two_loop import fused_two_loop
from scso_tpu.ops.prox import prox_step
from scso_tpu.ops.smoothers import get_Mg
from scso_tpu.problems import Problem


class GLMCache(NamedTuple):
    """Cross-epoch GLM epoch-prep cache (the epoch-fused greedy path).

    Invariant: all four fields correspond to the CURRENT iterate x —
    they were computed by the previous epoch's dual-candidate pass
    (fused_glm_prep_pair) for whichever candidate won, or by the priming
    pass at x0. ``loss`` is the DATA loss f(x) at prob.f_val's scale, so
    it doubles as the stats record's fval (no stats data pass).
    Everything here depends only on (A, y, z=A·x) — NOT on λ or μ — so a
    cache stays valid across continuation stages."""

    w: jax.Array        # (m,) CG matvec weights at x
    b_raw: jax.Array    # (n,) Aᵀ·rw(y, A·x)
    hd_raw: jax.Array   # (n,) Σᵢ wᵢ·Aᵢⱼ² (Jacobi diagonal, data part)
    loss: jax.Array     # ()   f(x) — data loss, normalized


class MOGLMCache(NamedTuple):
    """Multi-output analogue of :class:`GLMCache`: Z = A·W replaces the
    scalar-GLM weight vector (the per-sample k×k curvature actions of
    the CG matvec derive from Z elementwise). Same invariant: all fields
    correspond to the CURRENT iterate; depends only on (A, y, Z), never
    on λ/μ."""

    Z: jax.Array        # (m, k) linear predictor at x
    grad_vec: jax.Array  # (n,) vec(Aᵀ·gres(y, Z)) — data gradient
    hd_raw: jax.Array   # (n,) data Jacobi diagonal (qdiag_w-weighted)
    loss: jax.Array     # ()   data loss f(x), normalized


def no_glm_cache(dtype=jnp.float32) -> GLMCache:
    """Placeholder carried when the epoch cache is disabled (the
    while_loop carry needs a fixed pytree structure per compiled
    program). A function, not a constant: building device arrays at
    import time would initialize the backend before config updates."""
    return GLMCache(w=jnp.zeros((0,), dtype), b_raw=jnp.zeros((0,), dtype),
                    hd_raw=jnp.zeros((0,), dtype),
                    loss=jnp.zeros((), dtype))


class StepOut(NamedTuple):
    x_new: jax.Array
    pri_res_norm: jax.Array
    dx: jax.Array
    gq: jax.Array       # ∇q at x (composite gradient), for BB caching
    gq_new: jax.Array   # ∇q at x_new (L-BFGS only; zeros otherwise)
    mem: LBFGSMemory
    d: jax.Array        # raw (undamped) direction — CG warm start seed
    cg_iters: jax.Array = None  # CG iterations spent (0 for dense/L-BFGS)
    bnorm: jax.Array = None  # EW forcing s_ref (first outer step length,
    #                          NaN until set) — see _forcing_tol; not a
    #                          CG rhs norm despite the field's name
    fcache: GLMCache = None  # updated epoch cache (epoch-fused greedy
    #                          path only; None otherwise)


# solver='auto' size budgets: above these the dense branches (n×n
# factorization / materialized m×n Jacobian) are strictly worse than the
# matrix-free CG path on TPU — 'auto' switches and warns once per shape.
_DENSE_NEWTON_MAX_N = 2048
_DENSE_GGN_MAX_ELEMS = 1 << 24  # m·n budget for materializing J

_warned: set = set()


def _warn_once(key, msg):
    if key not in _warned:
        _warned.add(key)
        import warnings

        warnings.warn(msg, stacklevel=3)


def _resolve_newton_solver(method, x) -> str:
    """'auto' → 'dense' (oracle parity) or 'cg' above the n budget."""
    if method.solver != "auto":
        return method.solver
    n = x.shape[-1]
    if n > _DENSE_NEWTON_MAX_N:
        _warn_once(
            ("newton-auto-cg", n),
            f"ProxNSCORE(solver='auto'): n={n} exceeds the dense budget "
            f"({_DENSE_NEWTON_MAX_N}) — using matrix-free Newton-CG. Pass "
            "solver='dense' to force the direct solve.",
        )
        return "cg"
    return "dense"


def _resolve_ggn_solver(method, prob, As, x) -> str:
    """'auto' → dense dual/primal (reference branch) or 'cg' when the
    materialized Jacobian would exceed the m·ny·n budget AND the
    matrix-free pieces (glm/mglm spec or out_fn for jvp/vjp) exist."""
    if method.solver != "auto":
        return method.solver
    if not (prob.has_data and getattr(As, "ndim", 0) == 2):
        return "auto"  # generic problems: keep the reference dense branch
    m, n = As.shape[0], x.shape[-1]
    ny = prob.mglm.n_out if prob.mglm is not None else 1
    matrix_free_ok = (prob.glm is not None or prob.mglm is not None
                      or prob.out_fn is not None)
    if prob.mglm is not None:
        # an mglm-only problem has a working matrix-free path but no
        # dense one unless the ggn_pieces inputs exist — routing it into
        # the dense branch by size alone would fail in prob.ggn_pieces
        # ("requires out_fn/loss_fn")
        dense_ok = (
            all(fn is not None
                for fn in (prob.jac_yx, prob.grad_fy, prob.hess_fy))
            or (prob.out_fn is not None and prob.loss_fn is not None))
        if not dense_ok:
            return "cg"
    if m * ny * n > _DENSE_GGN_MAX_ELEMS and matrix_free_ok:
        _warn_once(
            ("ggn-auto-cg", (m, ny, n)),
            f"ProxGGNSCORE(solver='auto'): J would be {m * ny}x{n} "
            f"(> {_DENSE_GGN_MAX_ELEMS} elements) — using matrix-free "
            "GGN-CG. Pass solver='dense_dual'/'dense_primal' to force a "
            "dense branch.",
        )
        return "cg"
    return "auto"


def _lam_scalar(lam):
    """λ[1] when multi-valued else λ — parity: prox-N-SCORE.jl:35-39."""
    lam = jnp.asarray(lam)
    if lam.ndim >= 1 and lam.shape[0] > 1:
        return lam.reshape(-1)[0]
    return lam.reshape(())


def _cw(prob: Problem, reg_name: str):
    """Diagonal of the reference's Cmat: group element-weights for 'gl',
    identity (None) otherwise — parity: iterate.jl:192-196."""
    if reg_name == "gl":
        if prob.groups is None:
            raise ValueError("'gl' regularizer requires group structure")
        return prob.groups.element_weights
    return None


def _resolve_step_size(method, prob: Problem, sm, reg_name, As, ys,
                       x, x_prev, gq, gq_prev, d, it, cw):
    """The three step-size schemes with reference branch-order parity.

    Newton/GGN (prox-N-SCORE.jl:73-90):
      ss1 & L set   → min(1/L, 1)
      ss1 & L unset → 0.5
      ss2           → 1 at iter 1 else inverse-BB
      ss3           → Armijo backtracking
    L-BFGS (prox-L-BFGS-SCORE.jl:108-125) — note the different order:
      ss1 & L set       → min(1/L, 1)
      ss2 OR L unset    → BB            (so ss1/ss3 without L go BB too)
      ss3               → Armijo
    """
    dt = x.dtype
    is_lbfgs = isinstance(method, ProxLQNSCORE)
    sst = method.ss_type
    if sst not in (1, 2, 3):
        raise ValueError("Please, choose ss_type in [1, 2, 3].")
    L = prob.L
    lam = _lam_scalar(prob.lam)

    def bb():
        ss = inv_bb_step(x, x_prev, gq, gq_prev)
        return jnp.where(it == 1, jnp.asarray(1.0, dt), ss.astype(dt))

    def linesearch():
        obj = lambda v: prob.f_val(As, ys, v) + prob.reg(reg_name, v)
        grad_q = lambda v: prob.grad_f(As, ys, v) + lam * sm.grad(v, cw)
        return armijo_linesearch(x, d, obj, grad_q)

    if sst == 1 and L is not None:
        return jnp.minimum(1.0 / L, 1.0).astype(dt)
    if is_lbfgs:
        if sst == 2 or L is None:
            return bb()
        return linesearch()  # sst == 3
    if sst == 1:
        return jnp.asarray(0.5, dt)
    if sst == 2:
        return bb()
    return linesearch()  # sst == 3


def _damped_prox_update(method, prob: Problem, reg_name, sm, x, d,
                        step_size, lam, lgr, Hr_diag):
    """SCORE damping + scaled prox — the tail shared by all three steps.

    α = ss / (1 + M_g·η), η = sqrt(λgr' · diag(1/Hr) · λgr), safe_α = min(1, α)
    then x⁺ = prox_{g}^{diag(1/Hr)}(x + safe_α·d) with threshold scale = ss.
    Parity: prox-N-SCORE.jl:92-118.

    With ``method.kernels == 'pallas'`` (and a supported reg kind) the
    whole tail runs as one fused Pallas kernel (ops/pallas/score_update).
    """
    # feature-padded problems damp with the TRUE n (get_Mg is n-dependent;
    # the padding is a storage detail, not a bigger problem)
    n_eff = prob.n_true if prob.n_true is not None else x.shape[-1]
    Mg = get_Mg(sm.Mh, sm.nu, sm.mu, n_eff)
    if (method.kernels == "pallas"
            and supports_fused_update(reg_name, method.use_prox)):
        x_new, pri, safe_alpha = fused_score_update(
            x, d, lgr, Hr_diag, lam, step_size, Mg, reg_name,
            use_prox=method.use_prox, lb=prob.lb, ub=prob.ub,
        )
        return x_new, pri, safe_alpha * d
    hdiag_inv = 1.0 / Hr_diag
    # η term: lgr²/Hr → 0 in the lgr→0 limit even when Hr = 0 (the GL
    # smoother's Hessian vanishes exactly where its gradient does, e.g. at
    # a fully-thresholded x = 0); the reference's expression 0·Inf NaNs
    # there (prox-N-SCORE.jl:99) — deliberate fix.
    eta_terms = jnp.where(lgr == 0, 0.0, lgr * hdiag_inv * lgr)
    eta = jnp.sqrt(jnp.sum(eta_terms))
    alpha = step_size / (1.0 + Mg * eta)
    safe_alpha = jnp.minimum(1.0, alpha)
    dx = safe_alpha * d
    if method.use_prox:
        lam_prox = prob.lam if reg_name == "gl" else lam
        x_new = prox_step(
            reg_name, x + dx, hdiag_inv, lam_prox, step_size,
            lb=prob.lb, ub=prob.ub, groups=prob.groups,
        )
        pri = jnp.linalg.norm(x_new - x)
    else:
        x_new = x + dx
        pri = jnp.linalg.norm(dx)
    return x_new, pri, dx


def _greedy_prox_update(method, prob: Problem, reg_name, sm, As, ys,
                        x, d, step_size, lam, lgr, Hr_diag, z=None):
    """Greedy SCORE damping (``method.greedy_alpha``).

    Trials the UNDAMPED prox step x_trial = prox(x + d) and accepts it
    iff the true composite objective F = f + g strictly decreases;
    otherwise falls back to the SCORE-damped step (whose self-concordance
    guarantee is untouched — every epoch either strictly decreases F or
    is exactly the reference-damped step). Measured motivation: at the
    north-star shape (n = 10⁴) the damping α = ss/(1+M_g·η) starts at
    ~0.06 and crawls for ~40 epochs while the full prox-GGN step is
    accepted outright — halving total epochs (benchmarks/diag_epochs.py).

    Cost: one extra objective evaluation per epoch (one data pass for the
    trial; F(x) reuses the step's linear predictor ``z`` when the GLM
    spec carries ``loss_z``). NaN-safe: a diverged trial objective fails
    the strict `<` test and is discarded.
    """
    x_damped, pri_d, dx_d = _damped_prox_update(
        method, prob, reg_name, sm, x, d, step_size, lam, lgr, Hr_diag
    )
    if method.use_prox:
        lam_prox = prob.lam if reg_name == "gl" else lam
        x_trial = prox_step(
            reg_name, x + d, 1.0 / Hr_diag, lam_prox, step_size,
            lb=prob.lb, ub=prob.ub, groups=prob.groups,
        )
    else:
        x_trial = x + d
    glm_ok = (prob.glm is not None
              and getattr(prob.glm, "loss_z", None) is not None
              and prob.has_data and getattr(As, "ndim", 0) == 2)
    mglm_ok = (prob.mglm is not None
               and getattr(prob.mglm, "loss_z", None) is not None
               and prob.has_data and getattr(As, "ndim", 0) == 2)
    if glm_ok:
        z_x = As @ x if z is None else z
        F_x = prob.glm.loss_z(ys, z_x) + prob.reg(reg_name, x)
        F_t = prob.glm.loss_z(ys, As @ x_trial) + prob.reg(reg_name, x_trial)
    elif mglm_ok:
        k = int(prob.mglm.n_out)
        Zf = lambda v: As @ v.reshape(v.shape[-1] // k, k)
        F_x = prob.mglm.loss_z(ys, Zf(x)) + prob.reg(reg_name, x)
        F_t = prob.mglm.loss_z(ys, Zf(x_trial)) + prob.reg(reg_name,
                                                           x_trial)
    else:
        F_x = prob.f_val(As, ys, x) + prob.reg(reg_name, x)
        F_t = prob.f_val(As, ys, x_trial) + prob.reg(reg_name, x_trial)
    accept = F_t < F_x
    x_new = jnp.where(accept, x_trial, x_damped)
    pri = jnp.where(accept, jnp.linalg.norm(x_trial - x), pri_d)
    dx = jnp.where(accept, d, dx_d)
    return x_new, pri, dx


def use_greedy(method, n=None, prob=None) -> bool:
    """Resolve greedy_alpha None = AUTO: on for ss_type=1 AND n >= 4096
    AND (when `prob` is given) a glm/mglm `loss_z` to price the trial.

    The first two conditions are measured: ss_type=3's Armijo can freeze
    at the l1 kinks the greedy full prox step lands on (reference
    oracle), and the SCORE damping greedy compensates over-throttles as
    M_g ∝ n^0.2 — a large-n phenomenon (n = 10112: 41 vs 120 epochs, big
    win; n = 1024: 29 vs 21, the trial's extra data pass loses). The
    loss_z condition bounds the trial's cost: without it the generic
    fallback evaluates BOTH F(x) and F(x_trial) via prob.f_val — two
    extra full data passes per epoch, not the documented one — so AUTO
    stays off there (explicit greedy_alpha=True still opts in). See
    methods.ProxNSCORE.greedy_alpha; explicit True/False always wins."""
    g = getattr(method, "greedy_alpha", False)
    if g is None:
        if method.ss_type != 1:
            return False
        if prob is not None:
            cheap = (
                (prob.glm is not None
                 and getattr(prob.glm, "loss_z", None) is not None)
                or (prob.mglm is not None
                    and getattr(prob.mglm, "loss_z", None) is not None))
            if not cheap:
                return False
        return n is None or n >= 4096
    return bool(g)


def _apply_update(method, prob: Problem, reg_name, sm, As, ys, x, d,
                  step_size, lam, lgr, Hr_diag, z=None):
    """Damped-prox tail, greedy variant when ``method.greedy_alpha``."""
    n_eff = prob.n_true if prob.n_true is not None else x.shape[-1]
    if use_greedy(method, n_eff, prob):
        return _greedy_prox_update(method, prob, reg_name, sm, As, ys,
                                   x, d, step_size, lam, lgr, Hr_diag, z)
    return _damped_prox_update(method, prob, reg_name, sm, x, d,
                               step_size, lam, lgr, Hr_diag)


def _cg_tol(method, dtype):
    """Resolve the CG forcing floor for the solve dtype.

    ``method.cg_tol <= 0`` (the default) means AUTO: 3e-4 in f32 (the
    measured headline-bench knee: epochs to the 1e-6 gap unchanged down
    to ~3e-4, CG iterations ~45% lower) and sqrt(eps) ≈ 1.5e-8 in f64
    (the reference-oracle regime). An explicit cg_tol is
    still floored at 4·eps: asking f32 CG for 1e-8 relative residual just
    accumulates drift for maxiter iterations. The floor must stay WELL
    below the typical outer gap target (1e-6): with warm-started CG a
    loose floor (e.g. 25·eps) lets every solve exit at 0 iterations and
    stalls outer convergence (observed: 720 epochs to a 1e-6 gap instead
    of ~60)."""
    eps = float(jnp.finfo(dtype).eps)
    if method.cg_tol > 0:
        tol = method.cg_tol
    elif jnp.dtype(dtype) == jnp.float32:
        # EXACTLY the measured knee, not sqrt(eps) = 3.45e-4: the 15%
        # difference matters — at the north-star shape the 3.45e-4
        # inexact fixed point sits just outside the 1e-6 gap and the
        # endgame creeps for 400+ epochs (measured: 2.75 s / 41 epochs
        # at 3e-4 vs 23.3 s / 447 at 3.45e-4, .bench_r3_* logs)
        tol = 3e-4
    else:
        tol = eps ** 0.5
    return max(tol, 4.0 * eps)


def _forcing_tol(method, b, x, x_prev, ref_prev, it, endgame=False):
    """(tol, step_ref) for the CG solve.

    With ``method.cg_adaptive`` (Eisenstat–Walker-style forcing):
    η_k = clip(0.9·(‖x_k − x_{k-1}‖ / s_ref)², cg_tol, 0.1), s_ref = the
    first step length — spend few CG iterations while the outer iterates
    still move a lot, tighten superlinearly as the steps shrink. The
    STEP LENGTH is the right signal for prox-SCORE: the smoothed
    composite gradient does NOT vanish at the damped-prox fixed point
    (the prox absorbs the nonsmooth part), so RHS-norm-based EW variants
    plateau and stall the x_tol stopping test; the step length does go
    to 0 there, driving η to the cg_tol floor so the endgame matches a
    fixed-tolerance solve. ``ref_prev`` carries s_ref (NaN until the
    first real step). Without the flag: the fixed floored cg_tol.

    ``endgame=True`` (all Newton/GGN CG paths, cached and uncached)
    enables TIGHTENING-ONLY forcing:
    η_k = clip(0.9·ratio², 4·eps, cg_tol) — the bulk phase
    keeps the measured cg_tol knee (unlike cg_adaptive, which loosens
    mid-flight and measured 120 vs 41 epochs), but as the outer steps
    shrink the direction is refined toward machine precision. Rationale
    (measured at the north-star shape): at a fixed 3e-4 forcing the
    INEXACT iteration owns a fixed point a ~1e-5 relative gap away from
    the true optimum, and once the greedy trial stops strictly
    decreasing F the damped dynamics converge to THAT point — the
    recorded objective climbs away from the anchor for 60-epoch
    stretches (.ns_cache logs, 180-epoch bench stall). Tightening with
    the step length removes the inexact fixed point exactly where it
    matters while costing extra CG iterations only in the endgame.
    An explicit ``cg_adaptive=True`` wins over ``endgame``, and the mode
    only engages at f32-and-below precision: the f64 floor sqrt(eps)
    already puts the inexact fixed point ~1e-16 relative from the true
    one (no observable drift), and the f64 oracle/parity suites pin the
    fixed-tolerance trajectories bit-for-bit."""
    floor = _cg_tol(method, b.dtype)
    if endgame and jnp.finfo(b.dtype).bits > 32:
        endgame = False
    if endgame and not method.cg_adaptive:
        eps4 = 4.0 * float(jnp.finfo(b.dtype).eps)
        dxn = jnp.linalg.norm(x - x_prev)
        rp = (jnp.asarray(jnp.nan, b.dtype) if ref_prev is None
              else jnp.asarray(ref_prev))
        unset = jnp.isnan(rp) | (rp <= 0)
        ref = jnp.where(unset & (dxn > 0), dxn, rp)
        ratio = dxn / jnp.maximum(ref, jnp.finfo(b.dtype).tiny)
        eta = jnp.clip(0.9 * ratio * ratio, eps4, floor)
        eta = jnp.where(jnp.isnan(ref) | (it <= 1),
                        jnp.asarray(floor, eta.dtype), eta)
        return eta, ref
    if not method.cg_adaptive:
        return floor, jnp.asarray(jnp.nan, b.dtype)
    eta_max = 0.1
    dxn = jnp.linalg.norm(x - x_prev)
    if ref_prev is None:
        rp = jnp.asarray(jnp.nan, b.dtype)
    else:
        rp = jnp.asarray(ref_prev)
    unset = jnp.isnan(rp) | (rp <= 0)
    ref = jnp.where(unset & (dxn > 0), dxn, rp)
    ratio = dxn / jnp.maximum(ref, jnp.finfo(b.dtype).tiny)
    eta = jnp.clip(0.9 * ratio * ratio, floor, eta_max)
    eta = jnp.where(jnp.isnan(ref) | (it <= 1),
                    jnp.asarray(eta_max, eta.dtype), eta)
    return eta, ref


def _lp_tol_refused(method, dtype) -> bool:
    """True (with a one-shot warning) when cg_lp_tol sits below the
    reachable CG forcing range for this dtype.

    Under the tightening-only endgame schedule (f32, not cg_adaptive —
    _forcing_tol endgame=True) the forcing DOES drop below the floor
    once the outer steps shrink, so lp_tol == floor is exactly the
    "bf16 through the bulk phase, f32 once the endgame tightens"
    setting: the engage test `tol >= lp_tol` holds at the floor and
    fails as soon as the schedule tightens. With cg_adaptive (or f64)
    the tolerance never passes below the floor and equality would pin
    bf16 through the endgame — refuse there. A threshold strictly below
    the floor would keep the low-precision matvec engaged through the
    ENDGAME — CG then chases a residual below the copy's own error and
    burns cg_maxiter every epoch. Refuse rather than stall."""
    lp_tol = getattr(method, "cg_lp_tol", 0.0)
    floor = _cg_tol(method, dtype)
    endgame_mode = (jnp.finfo(dtype).bits <= 32
                    and not method.cg_adaptive)
    if lp_tol < floor or (lp_tol == floor and not endgame_mode):
        _warn_once(
            ("lp-tol-floor", (lp_tol, floor)),
            f"cg_lp_tol={lp_tol:g} is <= the CG tolerance floor "
            f"{floor:g} — the low-precision matvec would stay engaged "
            "through the convergence endgame and stall CG below the "
            "copy's own error. Disabled; set cg_lp_tol well above "
            "cg_tol (e.g. 1e-2).",
        )
        return True
    return False


def _lp_matvec(method, prob: Problem, As, w, lhr):
    """Low-precision CG matvec for precision-adaptive CG, or None.

    Requires the problem to carry a low-precision data copy
    (``Problem.A_lp``, see algorithms.mixed.with_lp_copy) and
    ``method.cg_lp_tol > 0``. Full-batch only: a batch slice has no
    matching A_lp view (the shape check below). Row-sharded problems ARE
    supported (round 5): shard_problem shards A_lp alongside A, and the
    matvec routes through the shard_map'd fused kernel (or
    GSPMD-partitioned matmuls) exactly like _weighted_system's f32 path.
    """
    A_lp = getattr(prob, "A_lp", None)
    lp_tol = getattr(method, "cg_lp_tol", 0.0)
    if (lp_tol <= 0.0 or A_lp is None
            or A_lp.shape != As.shape):
        return None
    if _lp_tol_refused(method, w.dtype):
        return None
    mesh = getattr(prob, "mesh", None)
    if mesh is not None:
        axis = prob.data_axis
        shard_m = A_lp.shape[0] // mesh.shape[axis]
        if (method.kernels == "pallas"
                and supports_fused_normal_matvec(shard_m, A_lp.shape[1],
                                                 A_lp.dtype.itemsize)):
            return lambda v: fused_normal_matvec_sharded(
                A_lp, w, v, mesh, axis,
                overlap_chunks=getattr(method, "comm_overlap_chunks", 1),
            ) + lhr * v
        # GSPMD route: A_lp carries A's row sharding (shard_problem), w
        # is row-sharded elementwise, v replicated — XLA psums the
        # partials exactly like the f32 operator
        return lambda v: (A_lp.T @ (w * (A_lp @ v))
                          ).astype(w.dtype) + lhr * v
    if (method.kernels == "pallas"
            and supports_fused_normal_matvec(*A_lp.shape,
                                             A_lp.dtype.itemsize)):
        return lambda v: fused_normal_matvec(A_lp, w, v) + lhr * v
    return lambda v: (A_lp.T @ (w * (A_lp @ v))).astype(w.dtype) + lhr * v


def _weighted_system(method, As, x, w, lhr, prob: Problem = None):
    """(matvec, preconditioner) from precomputed GLM weights w:
    mv(v) = Aᵀ(w∘(Av)) + λHr∘v, Jacobi M⁻¹ = 1/(diag(AᵀWA) + λHr).

    The fused single-pass Pallas kernel carries the matvec when shapes
    allow — through the shard_map wrapper when the problem's data rows
    are mesh-sharded (shard_problem stamps mesh/data_axis) — else the
    explicit two-matmul form (still beats jvp-of-grad's three A passes).
    Preconditioning with λ·Hr alone is catastrophic for small λ — it
    rescales the system by 1/λ and CG diverges in f32.
    """
    tiny = jnp.finfo(x.dtype).tiny
    mesh = getattr(prob, "mesh", None)
    use_static = (getattr(method, "static_precond", False)
                  and getattr(prob, "col_sumsq", None) is not None
                  # col_sumsq was computed over ALL of prob.A's rows; a
                  # batch slice or curvature_rows subsample has fewer —
                  # scaling by sum(w_sub)/m_sub would inflate the data
                  # diagonal ~m/m_sub vs the lam*Hr term and skew the
                  # Jacobi preconditioner (same guard idea as A_lp's
                  # shape check in _lp_matvec)
                  and getattr(prob, "A", None) is not None
                  and As.shape[0] == prob.A.shape[0])
    if method.kernels == "pallas" and mesh is not None:
        axis = prob.data_axis
        shard_m = As.shape[0] // mesh.shape[axis]
        if supports_fused_normal_matvec(shard_m, As.shape[1],
                                        As.dtype.itemsize):
            mv = lambda v: fused_normal_matvec_sharded(
                As, w, v, mesh, axis,
                overlap_chunks=getattr(method, "comm_overlap_chunks", 1),
            ) + lhr * v
        else:
            mv = lambda v: As.T @ (w * (As @ v)) + lhr * v
    elif (method.kernels == "pallas"
            and supports_fused_normal_matvec(*As.shape,
                                             As.dtype.itemsize)):
        mv = lambda v: fused_normal_matvec(As, w, v) + lhr * v
    else:
        mv = lambda v: As.T @ (w * (As @ v)) + lhr * v
    if use_static:
        # static Jacobi: mean(w)·diag(AᵀA) — O(m+n) instead of a full
        # extra A pass per epoch; exact when w is uniform (least
        # squares), a quality-only approximation otherwise (the CG
        # operator and fixed point are unchanged). Under row sharding
        # sum(w) psums automatically (w is a sharded elementwise value).
        hdiag = (jnp.sum(w) / As.shape[0]) * prob.col_sumsq + lhr
    else:
        hdiag = jnp.einsum("i,ij,ij->j", w, As, As) + lhr
    M_inv = lambda v: v / jnp.maximum(hdiag, tiny)
    return mv, M_inv


def _glm_kernel_fns(g, m_total, flavor: str = "ggn"):
    """Tile-safe (rw_fn, w_fn, loss_fn) closures for the fused GLM prep
    kernels. ``flavor``:
      * 'ggn'    — rw = σ'·res (RHS pullback weights), w = σ'²·qdiag
        (GGN matvec weights), saturation-stable product forms when the
        spec provides them;
      * 'newton' — rw = gres (gradient residual: ∇f = Aᵀ·gres), w =
        hvp_w (TRUE Hessian weights: ∇²f·v = Aᵀ(w∘(Av))).
    Each is rescaled from the tile's sample count to the true m when the
    spec is sample-normalized (contract: GLMSpec.sample_normalized —
    inside a tiled kernel z.shape[0] is the TILE size). ``loss_fn`` is
    the RAW per-sample loss (GLMSpec.loss_sample; None when absent)."""

    def _norm_fix(val, zb):
        if g.sample_normalized and zb.shape[0] != m_total:
            return val * (zb.shape[0] / m_total)
        return val

    if flavor == "newton":
        rw_fn = lambda yb, zb: _norm_fix(g.gres(yb, zb), zb)
        w_fn = lambda yb, zb: _norm_fix(g.hvp_w(yb, zb), zb)
        return rw_fn, w_fn, g.loss_sample
    if flavor != "ggn":
        raise ValueError(f"unknown GLM kernel flavor {flavor!r}")

    def rw_fn(yb, zb):
        if g.ggn_rw is not None:
            return _norm_fix(g.ggn_rw(yb, zb), zb)
        return _norm_fix(g.dlink(zb) * g.res(yb, g.link(zb)), zb)

    def w_fn(yb, zb):
        if g.ggn_w is not None:
            return _norm_fix(g.ggn_w(yb, zb), zb)
        sp = g.dlink(zb)
        return _norm_fix(sp * sp * g.qdiag(yb, g.link(zb)), zb)

    return rw_fn, w_fn, g.loss_sample


def _loss_scale(g, m_total):
    """loss_z = scale · Σ loss_sample — see GLMSpec.loss_sample."""
    return (1.0 / m_total) if g.sample_normalized else 1.0


def epoch_cache_enabled(method, prob: Problem, reg_name: str,
                        full_batch: bool) -> bool:
    """Static predicate for the epoch-fused cache path (GLMCache).

    When true, the driver primes a GLMCache at x0 and every epoch runs:
      * the GGN-CG direction with ZERO prep A-passes (RHS/weights/Jacobi
        from the cache),
      * with greedy damping resolved on: the greedy trial + the NEXT
        epoch's prep as ONE dual-candidate A-pass (fused_glm_prep_pair);
        with greedy off: the damped step + ONE single-candidate re-prime
        pass (_damped_update_cached),
      * the stats objective from the cached loss (no stats data pass) —
        and the f_tol stopping test per-epoch-exact between stats rounds
        (iterate.gap_now)
    — ~2.9 A-passes/epoch instead of ~5.15 at the bench shape.

    Requirements (all static at trace time): ProxGGNSCORE or ProxNSCORE
    on the matrix-free CG path with ss_type=1, a (multi-output) GLM spec
    with loss_z AND loss_sample, full-batch data, and none of the opt-in
    CG variants that re-derive the system per epoch (curvature_rows,
    cg_lp_tol, static_precond). Row-sharded (mesh) problems ARE
    supported: the dual-candidate prep runs as plain GSPMD-partitioned
    matmuls (the pallas pair kernel is single-device only), the CG
    matvec keeps the shard_map'd fused kernel — the per-epoch pass
    savings carry over to multi-chip solves.
    """
    if (not isinstance(method, (ProxGGNSCORE, ProxNSCORE))
            or method.ss_type != 1):
        return False
    if getattr(method, "epoch_cache", None) is False:
        return False
    if not prob.has_data or getattr(prob.A, "ndim", 0) != 2:
        return False
    mo = prob.mglm
    if mo is not None:
        # multi-output path (takes precedence, like _ggn_cg_direction)
        if (mo.loss_z is None
                or getattr(mo, "loss_sample", None) is None):
            return False
    else:
        g = prob.glm
        if g is None or g.loss_z is None or g.loss_sample is None:
            return False
    if not full_batch:
        return False
    # curvature_rows only ACTS as a strict row subsample on an unsharded
    # problem (K >= m or mesh-sharded is a runtime no-op — same sync-
    # with-executed-path rule as the attachments below)
    K = int(getattr(method, "curvature_rows", 0) or 0)
    if 0 < K < prob.A.shape[0] and getattr(prob, "mesh", None) is None:
        return False
    # cg_lp_tol / static_precond only ACT when the problem carries the
    # matching attachment (A_lp / col_sumsq). The cached paths route
    # their curvature matvecs through A_lp themselves — single-output
    # (_ggn_cg_from_cache, incl. row-sharded via the shard_map'd
    # kernel) and multi-output (_mo_cg_from_cache) — so an ACTING lp no
    # longer disables the cache; a REFUSED lp threshold (below the
    # reachable forcing range, _lp_matvec's rule) surfaces the same
    # warning here because the cached solve reaches _lp_matvec only
    # after priming
    lp_tol = float(getattr(method, "cg_lp_tol", 0.0))
    if lp_tol > 0 and getattr(prob, "A_lp", None) is not None:
        _lp_tol_refused(method, prob.x0.dtype)
    if (getattr(method, "static_precond", False)
            and getattr(prob, "col_sumsq", None) is not None):
        return False
    if isinstance(method, ProxNSCORE):
        return _resolve_newton_solver(method, prob.x0) == "cg"
    return _resolve_ggn_solver(method, prob, prob.A, prob.x0) == "cg"


def _cache_flavor(method) -> str:
    return "newton" if isinstance(method, ProxNSCORE) else "ggn"


def _mo_shapes(g, x):
    k = int(g.n_out)
    pf = x.shape[-1] // k
    if k <= 0 or pf * k != x.shape[-1]:
        raise ValueError(
            f"mglm: n = {x.shape[-1]} incompatible with n_out = {k}")
    return k, pf


def _moglm_pair_prep(As, ys, g, x_t, x_d):
    """Dual-candidate MOGLM prep (jnp): the two candidates' Z, data
    gradient, Jacobi diagonal and loss from THREE A-reads total (the
    per-candidate quantities batch into single (m×p)·(p×2k) matmuls) —
    vs 3 prep + 2 trial objective passes + the stats pass uncached.
    Returns two (Z, grad_vec, hd_raw, loss) tuples, losses normalized.

    A fused single-read Pallas pair kernel was the round-4 follow-up
    candidate and is now a MEASURED NEGATIVE (round 5,
    benchmarks/mglm_audit.py at 196608×1024×16 on v5e): XLA already
    fuses this 3-pass form to 3.75 ms = 643 GB/s effective (< 2 true
    A-reads' worth of HBM time), and the cached epoch is ~96% CG
    matvecs (9.47 iters × 3.0 ms fused) — a perfect single-read prep
    kernel at roof (~1.25 ms) would buy at most ~8-12% of the epoch,
    within the audit's no-go bar. The measured 27% epoch win on this
    family came from precision-adaptive CG instead (bf16 curvature
    matvecs, _mo_lp_matvec: 38.8 → 28.3 ms/epoch, identical objective
    and CG counts — iterate._AUTO_LP_MIN_BYTES_MGLM)."""
    k, pf = _mo_shapes(g, x_t)
    m = As.shape[0]
    W2 = jnp.concatenate(
        [x_t.reshape(pf, k), x_d.reshape(pf, k)], axis=1)
    Z2 = As @ W2                                     # read 1
    Zt, Zd = Z2[:, :k], Z2[:, k:]
    R2 = jnp.concatenate([g.gres(ys, Zt), g.gres(ys, Zd)], axis=1)
    G2 = As.T @ R2                                   # read 2
    Q2 = jnp.concatenate([g.qdiag_w(ys, Zt), g.qdiag_w(ys, Zd)], axis=1)
    H2 = jnp.einsum("ic,ij,ij->jc", Q2, As, As)      # read 3
    scale = (1.0 / m) if getattr(g, "sample_normalized", True) else 1.0
    lt = jnp.sum(g.loss_sample(ys, Zt)) * scale
    ld = jnp.sum(g.loss_sample(ys, Zd)) * scale
    return ((Zt, G2[:, :k].reshape(-1), H2[:, :k].reshape(-1), lt),
            (Zd, G2[:, k:].reshape(-1), H2[:, k:].reshape(-1), ld))


def _prime_moglm(prob: Problem, x, As, ys) -> MOGLMCache:
    g = prob.mglm
    k, pf = _mo_shapes(g, x)
    Z = As @ x.reshape(pf, k)
    grad_vec = (As.T @ g.gres(ys, Z)).reshape(-1)
    hd = jnp.einsum("ic,ij,ij->jc", g.qdiag_w(ys, Z), As, As).reshape(-1)
    scale = ((1.0 / As.shape[0])
             if getattr(g, "sample_normalized", True) else 1.0)
    loss = jnp.sum(g.loss_sample(ys, Z)) * scale
    return MOGLMCache(Z=Z, grad_vec=grad_vec, hd_raw=hd, loss=loss)


def _use_pair_kernel(method, prob: Problem, n: int) -> bool:
    """Shape gate for the Pallas pair/prime kernel — mirrors the
    use_fused_prep AUTO rule (n >= 8192, the measured-win regime; at
    n = 1024 the VPU row-reduce kernel LOSES to XLA's own prep fusion —
    0.676 vs 0.434 s at 524288×1024 when the damped-cache re-prime ran
    it unconditionally). Pallas kernels are single-device: mesh-sharded
    problems always take the GSPMD-partitioned jnp route."""
    if method.kernels != "pallas" or getattr(prob, "mesh", None) is not None:
        return False
    fprep = getattr(method, "use_fused_prep", None)
    return bool(fprep) if fprep is not None else n >= 8192


def prime_glm_cache(method, prob: Problem, x, As=None, ys=None):
    """Build the epoch cache at iterate x (GLMCache, or MOGLMCache for
    multi-output problems) — one A-pass for the scalar-GLM pair kernel
    (both candidates = x; the duplicate costs only VPU flops on a
    bandwidth-bound pass), three for the multi-output jnp prep."""
    As = prob.A if As is None else As
    ys = prob.y if ys is None else ys
    if prob.mglm is not None:
        return _prime_moglm(prob, x, As, ys)
    g = prob.glm
    rw_fn, w_fn, loss_fn = _glm_kernel_fns(g, As.shape[0],
                                           _cache_flavor(method))
    if not _use_pair_kernel(method, prob, As.shape[1]):
        # jnp route: one matmul + pullbacks (vmap/CPU/GSPMD-safe — the
        # pair kernel is single-device only)
        z = As @ x
        return GLMCache(
            w=w_fn(ys, z), b_raw=As.T @ rw_fn(ys, z),
            hd_raw=jnp.einsum("i,ij,ij->j", w_fn(ys, z), As, As),
            loss=jnp.sum(loss_fn(ys, z)) * _loss_scale(g, As.shape[0]))
    pp = fused_glm_prep_pair(As, ys, x, x, rw_fn, w_fn, loss_fn)
    return GLMCache(w=pp.w_t, b_raw=pp.b_t, hd_raw=pp.hd_t,
                    loss=pp.loss_t * _loss_scale(g, As.shape[0]))


def _ggn_cg_from_cache(method, prob: Problem, As, x, gr, Hr_diag, lam,
                       cache: GLMCache, d_prev, it, bnorm_prev, x_prev):
    """GGN-CG direction with ZERO prep A-passes: the RHS pullback,
    matvec weights and Jacobi diagonal come from the carried GLMCache
    (computed by the previous epoch's dual-candidate pass, or the
    priming pass at x0). Only the smoother tail (λ·gr, λ·Hr) is fresh —
    it depends on λ/μ/x but not on A."""
    lhr = lam * Hr_diag
    b = -(cache.b_raw + lam * gr)
    tiny = jnp.finfo(x.dtype).tiny
    hdiag = cache.hd_raw + lhr
    M_inv = lambda v: v / jnp.maximum(hdiag, tiny)
    w = cache.w
    mesh = getattr(prob, "mesh", None)
    if method.kernels == "pallas" and mesh is not None:
        # row-sharded data: the fused matvec via the shard_map wrapper
        axis = prob.data_axis
        shard_m = As.shape[0] // mesh.shape[axis]
        if supports_fused_normal_matvec(shard_m, As.shape[1],
                                        As.dtype.itemsize):
            mv = lambda v: fused_normal_matvec_sharded(
                As, w, v, mesh, axis,
                overlap_chunks=getattr(method, "comm_overlap_chunks", 1),
            ) + lhr * v
        else:
            mv = lambda v: As.T @ (w * (As @ v)) + lhr * v
    elif (method.kernels == "pallas"
            and supports_fused_normal_matvec(*As.shape,
                                             As.dtype.itemsize)):
        mv = lambda v: fused_normal_matvec(As, w, v) + lhr * v
    else:
        mv = lambda v: As.T @ (w * (As @ v)) + lhr * v
    xp = x if x_prev is None else x_prev
    tol, bnorm = _forcing_tol(method, b, x, xp, bnorm_prev, it,
                              endgame=True)
    mv_lp = _lp_matvec(method, prob, As, w, lhr)
    if mv_lp is not None:
        # precision-adaptive CG on the cached path: while the
        # tightening-only forcing sits at (or above) cg_lp_tol the
        # curvature matvecs stream the bf16 copy at half the HBM
        # traffic; once the endgame tightens past the threshold CG
        # switches back to the f32 operator. RHS/prep stay f32 (exact
        # gradient, inexact direction — the safe inexact-Newton split).
        run = lambda m_: cg_solve(m_, b, d_prev, tol=tol,
                                  maxiter=method.cg_maxiter, M_inv=M_inv)
        res = jax.lax.cond(tol >= method.cg_lp_tol,
                           lambda _: run(mv_lp), lambda _: run(mv), None)
    else:
        res = cg_solve(mv, b, d_prev, tol=tol, maxiter=method.cg_maxiter,
                       M_inv=M_inv)
    return res.x, res.iters, bnorm


def _greedy_update_cached(method, prob: Problem, reg_name, sm, As, ys,
                          x, d, step_size, lam, lgr, Hr_diag,
                          cache: GLMCache):
    """Greedy SCORE damping via the dual-candidate fused pass.

    Semantics match _greedy_prox_update exactly — trial the UNDAMPED
    prox step, accept iff the true composite objective strictly
    decreases, else take the SCORE-damped step — but the trial
    objective, the damped candidate's objective AND the next epoch's
    full CG prep for BOTH candidates come from ONE pass over A
    (fused_glm_prep_pair), with F(x) carried in the cache instead of
    recomputed. Whichever candidate wins, its prep columns become the
    new cache. NaN-safe like the uncached path: a diverged trial loss
    fails the strict `<` test.
    """
    x_damped, pri_d, dx_d = _damped_prox_update(
        method, prob, reg_name, sm, x, d, step_size, lam, lgr, Hr_diag)
    if method.use_prox:
        lam_prox = prob.lam if reg_name == "gl" else lam
        x_trial = prox_step(
            reg_name, x + d, 1.0 / Hr_diag, lam_prox, step_size,
            lb=prob.lb, ub=prob.ub, groups=prob.groups,
        )
    else:
        x_trial = x + d
    g = prob.glm
    m_total = As.shape[0]
    rw_fn, w_fn, loss_fn = _glm_kernel_fns(g, m_total,
                                           _cache_flavor(method))
    if _use_pair_kernel(method, prob, As.shape[1]):
        pp = fused_glm_prep_pair(As, ys, x_trial, x_damped,
                                 rw_fn, w_fn, loss_fn)
    else:
        # jnp fallback (CPU tests, vmapped sweeps, mesh-sharded data —
        # GSPMD partitions these plain matmuls): same outputs, one
        # batched A@[x_t x_d] matmul + per-column pullbacks
        from scso_tpu.ops.pallas.glm_prep import PairPrep
        Z2 = As @ jnp.stack([x_trial, x_damped], axis=1)

        def col(z):
            w_ = w_fn(ys, z)
            return (w_, As.T @ rw_fn(ys, z),
                    jnp.einsum("i,ij,ij->j", w_, As, As),
                    jnp.sum(loss_fn(ys, z)))

        wt, bt, ht, lt = col(Z2[:, 0])
        wd, bd, hd, ld = col(Z2[:, 1])
        pp = PairPrep(wt, wd, bt, bd, ht, hd, lt, ld)
    scale = _loss_scale(g, m_total)
    loss_t = pp.loss_t * scale
    loss_d = pp.loss_d * scale
    F_t = loss_t + prob.reg(reg_name, x_trial)
    F_x = cache.loss + prob.reg(reg_name, x)
    # two-way accept, round-3 greedy semantics. A monotone keep-x guard
    # was tried here and REVERTED: the damped iteration minimizes the
    # SMOOTHED composite, so damped steps that increase the true F are
    # legitimate traversal — hard-rejecting them froze solves
    # mid-descent (f64 fixture: stuck at obj 0.6957 vs 0.6938). The
    # endgame drift this guard aimed at is handled by the
    # tightening-only forcing instead (_forcing_tol endgame=True).
    accept = F_t < F_x
    sel = lambda a, b: jnp.where(accept, a, b)
    x_new = sel(x_trial, x_damped)
    pri = sel(jnp.linalg.norm(x_trial - x), pri_d)
    dx = sel(d, dx_d)
    fc = GLMCache(w=sel(pp.w_t, pp.w_d), b_raw=sel(pp.b_t, pp.b_d),
                  hd_raw=sel(pp.hd_t, pp.hd_d), loss=sel(loss_t, loss_d))
    return x_new, pri, dx, fc


def _mo_curv_matvec(method, prob: Problem, Amat, ys, Z, g, lhr, pf, k,
                    prefer_fused=True):
    """Curvature-matvec closure for the multi-output cached path against
    an arbitrary data-matrix view ``Amat`` (A itself, or the bf16 A_lp
    copy for precision-adaptive CG — the spec's quad and the cached Z
    stay f32 either way; only the two A contractions go narrow).

    ``prefer_fused=False`` forces the XLA two-matmul form — the
    measured-best route for the bf16 copy (in-jit chained matvecs at
    196608×1024×16 on v5e, round 5): the fused kernel is COMPUTE-bound
    at ~304 GB/s effective (k-sublane MXU padding + quad VPU), so bf16
    tiles buy it nothing (2.65 → 2.73 ms), while the XLA pair drops
    3.41 → 2.34 ms with bf16 operands — faster than the fused f32
    kernel itself."""
    out_dt = Z.dtype
    use_fused = (prefer_fused
                 and method.kernels == "pallas"
                 and getattr(prob, "mesh", None) is None
                 and getattr(ys, "ndim", 0) == 2
                 and supports_fused_mglm_matvec(Amat.shape[0], pf, k,
                                                Amat.dtype.itemsize))
    if use_fused:
        return lambda v: fused_mglm_matvec(
            Amat, ys, Z, v.reshape(pf, k), g.quad).reshape(-1) + lhr * v
    return lambda v: (Amat.T @ g.quad(ys, Z, (Amat @ v.reshape(pf, k)
                                              ).astype(out_dt))
                      ).astype(out_dt).reshape(-1) + lhr * v


def _mo_lp_matvec(method, prob: Problem, As, ys, Z, g, lhr, pf, k):
    """Low-precision curvature matvec for the multi-output cached path,
    or None — the mglm analogue of _lp_matvec (round 5): while the
    tightening-only forcing sits at the floor, the two (m×p)·(p×k) CG
    contractions stream the bf16 copy; the cached Z, the spec's
    per-sample quad action and the RHS stay f32. Routed through the
    XLA pair, not the fused kernel (prefer_fused=False — see
    _mo_curv_matvec: the kernel is compute-bound and gains nothing from
    narrow tiles; the bf16 XLA pair is the measured-fastest operator at
    the bench shape, 2.34 vs 2.65 ms fused-f32)."""
    A_lp = getattr(prob, "A_lp", None)
    lp_tol = getattr(method, "cg_lp_tol", 0.0)
    if lp_tol <= 0.0 or A_lp is None or A_lp.shape != As.shape:
        return None
    if _lp_tol_refused(method, Z.dtype):
        return None
    return _mo_curv_matvec(method, prob, A_lp, ys, Z, g, lhr, pf, k,
                           prefer_fused=False)


def _mo_cg_from_cache(method, prob: Problem, As, ys, x, gr, Hr_diag, lam,
                      cache: MOGLMCache, d_prev, it, bnorm_prev, x_prev):
    """Multi-output GGN/Newton-CG direction from the carried MOGLMCache:
    the Z/gradient/Jacobi prep reads disappear; each CG matvec applies
    the per-sample k×k curvature action from the cached Z. With an
    attached A_lp + engaging cg_lp_tol (auto_lp resolves both), the
    bulk-phase matvecs stream the bf16 copy (_mo_lp_matvec)."""
    g = prob.mglm
    k, pf = _mo_shapes(g, x)
    lhr = lam * Hr_diag
    b = -(cache.grad_vec + lam * gr)
    tiny = jnp.finfo(x.dtype).tiny
    hdiag = cache.hd_raw + lhr
    M_inv = lambda v: v / jnp.maximum(hdiag, tiny)
    Z = cache.Z
    mv = _mo_curv_matvec(method, prob, As, ys, Z, g, lhr, pf, k)
    xp = x if x_prev is None else x_prev
    tol, bnorm = _forcing_tol(method, b, x, xp, bnorm_prev, it,
                              endgame=True)
    mv_lp = _mo_lp_matvec(method, prob, As, ys, Z, g, lhr, pf, k)
    if mv_lp is not None:
        run = lambda m_: cg_solve(m_, b, d_prev, tol=tol,
                                  maxiter=method.cg_maxiter, M_inv=M_inv)
        res = jax.lax.cond(tol >= method.cg_lp_tol,
                           lambda _: run(mv_lp), lambda _: run(mv), None)
    else:
        res = cg_solve(mv, b, d_prev, tol=tol, maxiter=method.cg_maxiter,
                       M_inv=M_inv)
    return res.x, res.iters, bnorm


def _greedy_update_cached_mo(method, prob: Problem, reg_name, sm, As, ys,
                             x, d, step_size, lam, lgr, Hr_diag,
                             cache: MOGLMCache):
    """Multi-output analogue of _greedy_update_cached: same greedy
    semantics; the dual-candidate prep is the batched jnp _moglm_pair_prep
    (3 A-reads for trial objective + both candidates' full prep)."""
    x_damped, pri_d, dx_d = _damped_prox_update(
        method, prob, reg_name, sm, x, d, step_size, lam, lgr, Hr_diag)
    if method.use_prox:
        lam_prox = prob.lam if reg_name == "gl" else lam
        x_trial = prox_step(
            reg_name, x + d, 1.0 / Hr_diag, lam_prox, step_size,
            lb=prob.lb, ub=prob.ub, groups=prob.groups,
        )
    else:
        x_trial = x + d
    ct, cd = _moglm_pair_prep(As, ys, prob.mglm, x_trial, x_damped)
    F_t = ct[3] + prob.reg(reg_name, x_trial)
    F_x = cache.loss + prob.reg(reg_name, x)
    # two-way accept — keep-x guard rejected, see _greedy_update_cached
    accept = F_t < F_x
    sel = lambda a, b: jnp.where(accept, a, b)
    x_new = sel(x_trial, x_damped)
    pri = sel(jnp.linalg.norm(x_trial - x), pri_d)
    dx = sel(d, dx_d)
    fc = MOGLMCache(Z=sel(ct[0], cd[0]), grad_vec=sel(ct[1], cd[1]),
                    hd_raw=sel(ct[2], cd[2]), loss=sel(ct[3], cd[3]))
    return x_new, pri, dx, fc


def _cg_from_cache(method, prob: Problem, As, ys, x, gr, Hr_diag, lam,
                   cache, d_prev, it, bnorm_prev, x_prev):
    """Dispatch the cached CG direction by problem kind (mglm first,
    mirroring _ggn_cg_direction's precedence)."""
    if prob.mglm is not None:
        return _mo_cg_from_cache(method, prob, As, ys, x, gr, Hr_diag,
                                 lam, cache, d_prev, it, bnorm_prev,
                                 x_prev)
    return _ggn_cg_from_cache(method, prob, As, x, gr, Hr_diag, lam,
                              cache, d_prev, it, bnorm_prev, x_prev)


def _damped_update_cached(method, prob: Problem, reg_name, sm, As, ys,
                          x, d, step_size, lam, lgr, Hr_diag, cache):
    """Damped-path epoch-cache refresh (greedy resolved OFF).

    The SCORE-damped prox step as usual, then ONE prime pass at x_new
    rebuilds the cache (z/weights/RHS/Jacobi/loss). Epoch cost becomes
    1 + CG A-passes — the stats data pass disappears (loss carried) and
    the f_tol test turns per-epoch-exact (iterate.gap_now), the same
    two wins the greedy path gets from its dual-candidate pass. This is
    what makes the cache worthwhile at shapes where greedy itself is a
    measured epoch-count negative (e.g. n = 1024: 29 greedy vs 21
    damped epochs).

    No objective guard here (a monotone keep-x variant was tried and
    reverted — see _greedy_update_cached): the damped step is taken
    unconditionally, exactly like the uncached damped path."""
    del cache  # refreshed wholesale at x_new
    x_new, pri, dx = _damped_prox_update(
        method, prob, reg_name, sm, x, d, step_size, lam, lgr, Hr_diag)
    fc = prime_glm_cache(method, prob, x_new, As, ys)
    return x_new, pri, dx, fc


def _cached_update(method, prob: Problem, reg_name, sm, As, ys, x, d,
                   step_size, lam, lgr, Hr_diag, cache):
    """Post-direction update on the epoch-cache path: greedy
    dual-candidate when greedy damping is resolved on, else the damped
    step + a single-candidate re-prime."""
    n_eff = prob.n_true if prob.n_true is not None else x.shape[-1]
    if not use_greedy(method, n_eff, prob):
        return _damped_update_cached(method, prob, reg_name, sm, As, ys,
                                     x, d, step_size, lam, lgr, Hr_diag,
                                     cache)
    if prob.mglm is not None:
        return _greedy_update_cached_mo(method, prob, reg_name, sm, As,
                                        ys, x, d, step_size, lam, lgr,
                                        Hr_diag, cache)
    return _greedy_update_cached(method, prob, reg_name, sm, As, ys, x,
                                 d, step_size, lam, lgr, Hr_diag, cache)


def _mo_glm_system(prob: Problem, As, ys, x, lhr, method=None):
    """(Z, grad_vec, matvec, preconditioner) for a multi-output GLM
    (``Problem.mglm``): Z = A·W computed ONCE (W = x.reshape(p, k)),
    ∇f = vec(Aᵀ·gres(y, Z)), and each curvature matvec applies the
    per-sample k×k curvature action
    mv(v) = vec(Aᵀ·quad(y, Z, A·V)) + λHr∘v — the dense (m·k)×n Jacobian
    of the reference's augmented system (prox-GGN-SCORE.jl:114-135) is
    never formed. With ``method.kernels == 'pallas'`` (single-device 2-D
    data) the matvec runs as the fused single-A-read Pallas kernel
    (ops/pallas/mglm_matvec — measured: the two-matmul XLA pair is the
    dominant epoch cost at bench scale, 370 GB/s effective); otherwise
    two (m×p)·(p×k) MXU matmuls. Jacobi preconditioner from the
    curvature block diagonals: diag ≈ Σᵢ qdiag_wᵢ·Aᵢⱼ² (exact for the
    diagonal part of each block; the −ppᵀ off-diagonal part is dropped,
    keeping it SPD). Row-sharded A partitions automatically under GSPMD
    (plain matmuls; the pallas_call is not GSPMD-partitionable, so a
    mesh-stamped problem keeps the XLA path).
    """
    g = prob.mglm
    k = int(g.n_out)
    if k <= 0:
        raise ValueError(
            "MOGLMSpec.n_out must be a positive static class count "
            "(build the spec per-k, e.g. losses.multinom_mglm(k))")
    pf = x.shape[-1] // k
    if pf * k != x.shape[-1]:
        raise ValueError(
            f"mglm: n = {x.shape[-1]} is not divisible by n_out = {k}")
    W = x.reshape(pf, k)
    Z = As @ W
    grad_vec = (As.T @ g.gres(ys, Z)).reshape(-1)

    use_fused = (method is not None and method.kernels == "pallas"
                 and getattr(prob, "mesh", None) is None
                 and getattr(ys, "ndim", 0) == 2
                 and supports_fused_mglm_matvec(As.shape[0], pf, k,
                                                As.dtype.itemsize))
    if use_fused:
        def mv(v):
            QU_pulled = fused_mglm_matvec(As, ys, Z, v.reshape(pf, k),
                                          g.quad)
            return QU_pulled.reshape(-1) + lhr * v
    else:
        def mv(v):
            V = v.reshape(pf, k)
            QU = g.quad(ys, Z, As @ V)
            return (As.T @ QU).reshape(-1) + lhr * v

    tiny = jnp.finfo(x.dtype).tiny
    w = g.qdiag_w(ys, Z)
    hdiag = jnp.einsum("ic,ij,ij->jc", w, As, As).reshape(-1) + lhr
    M_inv = lambda v: v / jnp.maximum(hdiag, tiny)
    return Z, grad_vec, mv, M_inv


def _glm_cg_system(method, prob: Problem, As, ys, x, lhr, weight_fn,
                   hvp_fallback):
    """(matvec, preconditioner) for the CG solve — weight_fn variant
    (recomputes z = A·x internally; prefer the GLMSpec z-reuse paths in
    the step functions when prob.glm is set)."""
    tiny = jnp.finfo(x.dtype).tiny
    if weight_fn is not None and prob.has_data and As.ndim == 2:
        w = weight_fn(As, ys, x)
        return _weighted_system(method, As, x, w, lhr, prob)
    mv = lambda v: hvp_fallback(v) + lhr * v
    M_inv = lambda v: v / jnp.maximum(lhr, tiny)
    return mv, M_inv


# ---------------------------------------------------------------------------
# Prox-Newton SCORE
# ---------------------------------------------------------------------------


def newton_step(method: ProxNSCORE, prob: Problem, reg_name: str, sm,
                As, ys, x, x_prev, gq_prev, it, mem: LBFGSMemory,
                d_prev=None, bnorm_prev=None, fcache=None) -> StepOut:
    """Full (quasi-)Newton step with self-concordant damping.

    Direction: d = −(∇²f + λ·diag(Hr))⁻¹ (∇f + λ·gr)
    — dense solve (prox-N-SCORE.jl:69-71) or matrix-free Newton-CG.
    ``d_prev`` (the previous epoch's direction) warm-starts CG: near
    convergence consecutive Newton systems barely change, so the previous
    solution is an excellent initial guess. With ``fcache`` (driver-
    primed GLMCache, newton flavor: gres/hvp_w weights) the step runs
    the epoch-fused greedy path like ggn_step.
    """
    lam = _lam_scalar(prob.lam)
    cw = _cw(prob, reg_name)
    gr = sm.grad(x, cw)
    lgr = lam * gr
    Hr_diag = sm.hess_diag(x, cw)
    solver = _resolve_newton_solver(method, x)

    if solver == "cg" and fcache is not None:
        d, cg_iters, bnorm = _cg_from_cache(
            method, prob, As, ys, x, gr, Hr_diag, lam, fcache, d_prev,
            it, bnorm_prev, x_prev)
        ss = _resolve_step_size(method, prob, sm, reg_name, As, ys,
                                x, x_prev, jnp.zeros_like(x), gq_prev,
                                d, it, cw)
        x_new, pri, dx, fc_new = _cached_update(
            method, prob, reg_name, sm, As, ys, x, d, ss, lam, lgr,
            Hr_diag, fcache)
        return StepOut(x_new, pri, dx, jnp.zeros_like(x),
                       jnp.zeros_like(x), mem, d, cg_iters, bnorm,
                       fcache=fc_new)

    use_glm = (prob.glm is not None and prob.has_data
               and getattr(As, "ndim", 0) == 2 and solver == "cg")
    use_mglm = (prob.mglm is not None and prob.has_data
                and getattr(As, "ndim", 0) == 2 and solver == "cg")
    z_cache = None
    mo_mv = mo_Minv = None
    if use_mglm:
        # multi-output GLM: for a linear-in-x model with loss convex in
        # Z = A·W, the GGN operator AᵀQA IS the Hessian — Newton-CG and
        # GGN-CG share the _mo_glm_system matvec
        _, grad_vec, mo_mv, mo_Minv = _mo_glm_system(
            prob, As, ys, x, lam * Hr_diag, method)
        gq = grad_vec + lgr
    elif use_glm:
        # single data pass for the linear predictor; gradient residual,
        # Hessian weights and the Jacobi diagonal all derive from it
        z = As @ x
        z_cache = z
        gq = As.T @ prob.glm.gres(ys, z) + lgr
    else:
        gq = prob.grad_f(As, ys, x) + lgr

    cg_iters = jnp.int32(0)
    bnorm = jnp.asarray(0.0, x.dtype)
    if solver == "dense":
        H = prob.hess_f(As, ys, x)
        d = -jnp.linalg.solve(H + lam * jnp.diag(Hr_diag), gq)
    elif solver == "cg":
        lhr = lam * Hr_diag
        if use_mglm:
            mv, M_inv = mo_mv, mo_Minv
        elif use_glm:
            w = prob.glm.hvp_w(ys, z)
            mv, M_inv = _weighted_system(method, As, x, w, lhr, prob)
        else:
            mv, M_inv = _glm_cg_system(method, prob, As, ys, x, lhr,
                                       prob.hvp_w,
                                       lambda v: prob.hvp_f(As, ys, x, v))
        x0_cg = None if d_prev is None else -d_prev
        tol, bnorm = _forcing_tol(method, gq, x, x_prev, bnorm_prev, it,
                                  endgame=True)
        res = cg_solve(mv, gq, x0_cg, tol=tol,
                       maxiter=method.cg_maxiter, M_inv=M_inv)
        d = -res.x
        cg_iters = res.iters
    else:
        raise ValueError(f"unknown ProxNSCORE solver {solver!r}")

    # ∇q at x_prev for BB (recomputed; the reference's Newton BB branch is
    # broken — see module docstring)
    if method.ss_type == 2:
        gqp = prob.grad_f(As, ys, x_prev) + lam * sm.grad(x_prev, cw)
    else:
        gqp = gq_prev
    ss = _resolve_step_size(method, prob, sm, reg_name, As, ys,
                            x, x_prev, gq, gqp, d, it, cw)
    x_new, pri, dx = _apply_update(
        method, prob, reg_name, sm, As, ys, x, d, ss, lam, lgr, Hr_diag,
        z=z_cache
    )
    return StepOut(x_new, pri, dx, gq, jnp.zeros_like(x), mem, d, cg_iters,
                   bnorm)


# ---------------------------------------------------------------------------
# Prox-GGN SCORE
# ---------------------------------------------------------------------------


def _ggn_dense_direction(solver, prob: Problem, As, ys, x, gr, Hr_diag, lam):
    """Dense GGN direction with the reference's dual/primal shape switch.

    Parity: ggn_score_step (prox-GGN-SCORE.jl:114-135). With the augmented
    Jt = [Jᵀ  λ·gr] and r̃ = [residual; 1]:
      dual  (q+1 ≤ n): d = H⁻¹ Jt (I + Q̃ JtᵀH⁻¹Jt)⁻¹ r̃,  H = diag(Hr)
      primal (else):   d = (Jt Q̃ Jtᵀ + λ·diag(Hr))⁻¹ Jt r̃
    (Note the reference's H carries no λ in the dual branch — a quirk we
    reproduce; the branches coincide at λ=1.)
    """
    n = x.shape[-1]
    yhat, J, residual, Q = prob.ggn_pieces(As, ys, x)
    J2 = J.reshape(-1, n)
    q = J2.shape[0]
    Q2 = jnp.asarray(Q).reshape(q, q)
    dt = x.dtype

    Jt = jnp.concatenate([J2.T, (lam * gr)[:, None]], axis=1)  # n × (q+1)
    rt = jnp.concatenate([residual.reshape(-1), jnp.ones((1,), dt)])
    Qp = jnp.zeros((q + 1, q + 1), dt).at[:q, :q].set(Q2)

    use_dual = (q + 1 <= n) if solver == "auto" else (solver == "dense_dual")

    if use_dual:
        hinv = 1.0 / Hr_diag
        HinvJt = Jt * hinv[:, None]
        Amat = Qp @ (Jt.T @ HinvJt)
        B = jnp.linalg.solve(jnp.eye(q + 1, dtype=dt) + Amat, rt)
        d = hinv * (Jt @ B)
    else:
        M = (Jt @ Qp) @ Jt.T + lam * jnp.diag(Hr_diag)
        d = jnp.linalg.solve(M, Jt @ rt)
    return -d


def _ggn_cg_direction(method, prob: Problem, As, ys, x, gr, Hr_diag, lam,
                      d_prev=None, it=None, bnorm_prev=None, x_prev=None):
    """Matrix-free GGN-CG direction (the scalable TPU path).

    Solves the primal system (JᵀQJ + λ·diag(Hr)) d = −(Jᵀr + λ·gr)
    matrix-free: GLM problems derive everything from one linear-predictor
    pass (saturation-stable forms); others apply J via jvp/vjp of out_fn
    with diagonal Q. Jacobi preconditioning by diag(AᵀWA) + λ·Hr, CG
    warm-started from the previous epoch's direction. On a row-sharded
    mesh each matvec psums partial sums over the data axis.

    Returns (d, cg_iters, bnorm, z) — z is the linear predictor A·x when
    the GLM path materialized one (reused by the greedy-α trial), else
    None.
    """
    z_cache = None
    lhr = lam * Hr_diag
    if (prob.mglm is not None and prob.has_data
            and getattr(As, "ndim", 0) == 2):
        # multi-output GLM (vector outputs per sample): one Z = A·W pass,
        # per-sample k×k curvature actions — the scalable replacement for
        # the reference's materialized (m·k)×n augmented Jacobian
        _, grad_vec, mv, M_inv = _mo_glm_system(prob, As, ys, x, lhr,
                                                method)
        b = -(grad_vec + lam * gr)
        mv_lp = None
    elif (prob.glm is not None and prob.has_data
            and getattr(As, "ndim", 0) == 2):
        # single-z GLM path: z = A·x once; ŷ, J-diagonal, residual,
        # curvature and CG weights are elementwise in z. Prefer the
        # STABLE product forms: the naive σ'·res / σ'²·qdiag
        # compositions overflow to 0·inf = NaN in f32 when the link
        # saturates (logistic at |z| > 17), which silently zeroes CG
        # (NaN fails the residual test at iteration 0).
        g = prob.glm
        m_total = As.shape[0]
        rw_fn, w_fn, _ = _glm_kernel_fns(g, m_total)

        K = int(getattr(method, "curvature_rows", 0) or 0)
        subsample = (0 < K < m_total
                     and getattr(prob, "mesh", None) is None)
        if subsample and K < 2 * x.shape[-1]:
            # a subsample thinner than ~n rows gives a (near-)singular
            # curvature estimate — measured to balloon CG iterations and
            # then diverge once K < n (rank-deficient JᵀQJ)
            _warn_once(
                ("curv-thin", (K, x.shape[-1])),
                f"curvature_rows={K} < 2·n={2 * x.shape[-1]}: the "
                "subsampled curvature is (near-)rank-deficient — expect "
                "CG to struggle or the outer iteration to diverge. Use "
                "curvature_rows >> n.",
            )
        # MEASURED on v5e: at 524288×1024 XLA already fuses the z/b/hdiag
        # passes well and the Mosaic prep kernel LOSES (0.455→0.599 s);
        # at the north-star 196608×10112 the single-pass kernel WINS
        # (2.70→2.14 s). use_fused_prep=None resolves by shape (AUTO:
        # n >= 8192 — the measured-win regime).
        fprep = method.use_fused_prep
        if fprep is None:
            fprep = As.shape[1] >= 8192
        if (not subsample
                and fprep and method.kernels == "pallas"
                and getattr(prob, "mesh", None) is None
                and supports_fused_normal_matvec(*As.shape,
                                                 As.dtype.itemsize)):
            # ONE pass over A for z + RHS pullback + Jacobi diagonal
            w, b_raw, hdiag_raw = fused_glm_prep(As, ys, x, rw_fn, w_fn)
            b = -(b_raw + lam * gr)
            tiny = jnp.finfo(x.dtype).tiny
            hdiag = hdiag_raw + lhr
            mv = lambda v: fused_normal_matvec(As, w, v) + lhr * v
            M_inv = lambda v: v / jnp.maximum(hdiag, tiny)
            mv_lp = _lp_matvec(method, prob, As, w, lhr)
        else:
            z = As @ x
            z_cache = z
            rw = rw_fn(ys, z)
            b = -(As.T @ rw + lam * gr)
            if subsample:
                # Subsampled curvature (method.curvature_rows): the RHS
                # above is EXACT over all rows; only the CG operator's
                # weights come from a strided ~K-row subsample, so each
                # CG matvec streams m_sub/m of the data. Strided (not
                # random): deterministic under jit/vmap/resume, and the
                # generators shuffle rows anyway — document for ordered
                # real data.
                stride = -(-m_total // K)  # ceil
                As_c, ys_c = As[::stride], ys[::stride]
                z_c = As_c @ x

                def w_sub(yb, zb):
                    if g.ggn_w is not None:
                        val = g.ggn_w(yb, zb)
                    else:
                        sp = g.dlink(zb)
                        val = sp * sp * g.qdiag(yb, g.link(zb))
                    # sample_normalized specs divide by the input length
                    # (= m_sub here) — already the Monte-Carlo average
                    # scale; unnormalized specs need the m/m_sub factor
                    if not g.sample_normalized:
                        val = val * (m_total / zb.shape[0])
                    return val

                mv, M_inv = _weighted_system(
                    method, As_c, x, w_sub(ys_c, z_c), lhr, prob)
                mv_lp = None  # exclusive: A_lp has full-m shape
            else:
                w = w_fn(ys, z)
                mv, M_inv = _weighted_system(method, As, x, w, lhr, prob)
                mv_lp = _lp_matvec(method, prob, As, w, lhr)
    else:
        yhat, residual, q_diag = prob.ggn_residual_qdiag(As, ys, x)
        _, jt = prob.vjp_out(As, x)
        b = -(jt(residual) + lam * gr)
        mv, M_inv = _glm_cg_system(
            method, prob, As, ys, x, lhr, prob.ggn_w,
            lambda v: jt(q_diag * prob.jvp_out(As, x, v)))
        mv_lp = None
    xp = x if x_prev is None else x_prev
    tol, bnorm = _forcing_tol(method, b, x, xp, bnorm_prev, it,
                              endgame=True)
    if mv_lp is not None:
        # precision-adaptive CG: while the forcing tolerance is looser
        # than cg_lp_tol, the low-precision copy's matvec error (bf16
        # ~1e-3 relative) is dominated by the allowed CG inexactness —
        # this epoch's curvature matvecs stream A_lp at half the HBM
        # traffic. The RHS b above stays full-precision (exact gradient,
        # inexact direction — the safe inexact-Newton split).
        run = lambda m_: cg_solve(m_, b, d_prev, tol=tol,
                                  maxiter=method.cg_maxiter, M_inv=M_inv)
        res = jax.lax.cond(tol >= method.cg_lp_tol,
                           lambda _: run(mv_lp), lambda _: run(mv), None)
    else:
        res = cg_solve(mv, b, d_prev, tol=tol,
                       maxiter=method.cg_maxiter, M_inv=M_inv)
    return res.x, res.iters, bnorm, z_cache


def ggn_step(method: ProxGGNSCORE, prob: Problem, reg_name: str, sm,
             As, ys, x, x_prev, gq_prev, it, mem: LBFGSMemory,
             d_prev=None, bnorm_prev=None, fcache=None) -> StepOut:
    """Generalized Gauss-Newton step with self-concordant damping.

    With ``fcache`` (a GLMCache primed by the driver when
    epoch_cache_enabled) the step runs the epoch-fused greedy path:
    cached prep → CG → one dual-candidate pass that is both the greedy
    trial and the next epoch's prep."""
    lam = _lam_scalar(prob.lam)
    cw = _cw(prob, reg_name)
    gr = sm.grad(x, cw)
    lgr = lam * gr
    Hr_diag = sm.hess_diag(x, cw)

    solver = _resolve_ggn_solver(method, prob, As, x)
    bnorm = jnp.asarray(0.0, x.dtype)
    z_cache = None
    if solver == "cg" and fcache is not None:
        d, cg_iters, bnorm = _cg_from_cache(
            method, prob, As, ys, x, gr, Hr_diag, lam, fcache, d_prev,
            it, bnorm_prev, x_prev)
        ss = _resolve_step_size(method, prob, sm, reg_name, As, ys,
                                x, x_prev, jnp.zeros_like(x), gq_prev,
                                d, it, cw)
        x_new, pri, dx, fc_new = _cached_update(
            method, prob, reg_name, sm, As, ys, x, d, ss, lam, lgr,
            Hr_diag, fcache)
        return StepOut(x_new, pri, dx, jnp.zeros_like(x),
                       jnp.zeros_like(x), mem, d, cg_iters, bnorm,
                       fcache=fc_new)
    if solver == "cg":
        d, cg_iters, bnorm, z_cache = _ggn_cg_direction(
            method, prob, As, ys, x, gr, Hr_diag, lam, d_prev,
            it=it, bnorm_prev=bnorm_prev, x_prev=x_prev)
    else:
        d = _ggn_dense_direction(solver, prob, As, ys, x, gr, Hr_diag, lam)
        cg_iters = jnp.int32(0)

    # composite gradients only needed for BB (ss2); GGN never forms ∇f
    # otherwise (parity: prox-GGN-SCORE.jl:58-63 defines grad_f lazily)
    if method.ss_type == 2:
        gq = prob.grad_f(As, ys, x) + lgr
        gqp = prob.grad_f(As, ys, x_prev) + lam * sm.grad(x_prev, cw)
    else:
        gq = jnp.zeros_like(x)
        gqp = gq_prev
    ss = _resolve_step_size(method, prob, sm, reg_name, As, ys,
                            x, x_prev, gq, gqp, d, it, cw)
    x_new, pri, dx = _apply_update(
        method, prob, reg_name, sm, As, ys, x, d, ss, lam, lgr, Hr_diag,
        z=z_cache
    )
    return StepOut(x_new, pri, dx, gq, jnp.zeros_like(x), mem, d, cg_iters,
                   bnorm)


# ---------------------------------------------------------------------------
# Prox-L-BFGS SCORE
# ---------------------------------------------------------------------------


def lbfgs_step(method: ProxLQNSCORE, prob: Problem, reg_name: str, sm,
               As, ys, x, x_prev, gq_prev, it, mem: LBFGSMemory,
               gq_cached=None, d_prev=None) -> StepOut:
    """L-BFGS step with self-concordant damping.

    Direction from the two-loop recursion on the composite gradient
    ∇q = ∇f + λ·∇g_s (prox-L-BFGS-SCORE.jl:101-106); with empty memory the
    recursion degenerates to −H0·∇q = −∇q, which covers the reference's
    explicit iter==1 branch.

    The reference evaluates TWO full gradients per step (at x and x_new,
    prox-L-BFGS-SCORE.jl:101,148-151). In full-batch mode the driver
    carries ∇q(x_new) forward as `gq_cached`, halving gradient work with
    bit-identical results; pass gq_cached=None (mini-batch) to recompute.
    """
    lam = _lam_scalar(prob.lam)
    cw = _cw(prob, reg_name)
    gr = sm.grad(x, cw)
    lgr = lam * gr
    Hr_diag = sm.hess_diag(x, cw)

    if gq_cached is not None:
        gq = gq_cached
    else:
        gq = prob.grad_f(As, ys, x) + lgr

    if method.kernels == "pallas":
        d = fused_two_loop(mem, gq)
    else:
        d = two_loop(mem, gq)

    ss = _resolve_step_size(method, prob, sm, reg_name, As, ys,
                            x, x_prev, gq, gq_prev, d, it, cw)
    x_new, pri, dx = _apply_update(
        method, prob, reg_name, sm, As, ys, x, d, ss, lam, lgr, Hr_diag
    )

    # curvature pair from the NEW composite gradient
    # (parity: prox-L-BFGS-SCORE.jl:148-162)
    delta = x_new - x
    gq_new = prob.grad_f(As, ys, x_new) + lam * sm.grad(x_new, cw)
    gamma = gq_new - gq
    mem = update_memory(mem, delta, gamma)
    return StepOut(x_new, pri, dx, gq, gq_new, mem, d, jnp.int32(0),
                   jnp.asarray(0.0, x.dtype))


def make_step_fn(method):
    """Dispatch a method config to its step implementation (trace-time)."""
    if isinstance(method, ProxNSCORE):
        return newton_step
    if isinstance(method, ProxGGNSCORE):
        return ggn_step
    if isinstance(method, ProxLQNSCORE):
        return lbfgs_step
    raise TypeError(f"unknown method {method!r}")
