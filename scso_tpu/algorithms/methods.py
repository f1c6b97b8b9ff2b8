"""Method configuration objects (static, hashable).

Replace the reference's mutable `@kwdef` method structs
(prox-N-SCORE.jl:6-22, prox-GGN-SCORE.jl:6-22, prox-L-BFGS-SCORE.jl:6-30)
with frozen dataclasses used as jit-static arguments — the method kind,
step-size scheme and solver choice specialize the compiled program, like
Julia method specialization did.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


#: ``kernels`` values (all methods):
#:   'auto'   — resolved by the driver to 'pallas' on a single-device TPU
#:              backend, 'xla' otherwise (CPU, sharded data, vmapped sweeps);
#:   'pallas' — use the fused Pallas kernels (ops/pallas/) wherever the
#:              shapes/reg kind support them, falling back per-op;
#:   'xla'    — pure jnp/XLA everywhere.
_KERNEL_MODES = ("auto", "pallas", "xla")


@dataclasses.dataclass(frozen=True)
class ProxNSCORE:
    """Proximal Newton with self-concordant regularization.

    ``solver``: 'dense' reproduces the reference's direct solve
    (H + λ·diag(Hr)) \\ ∇q (prox-N-SCORE.jl:70); 'cg' runs matrix-free
    Newton-CG on HVPs (the scalable TPU path); 'auto' (default) is
    size-aware — dense for small n (reference-oracle parity), CG once the
    n×n factorization would dominate (warns once per shape).
    """

    ss_type: int = 1
    use_prox: bool = True
    solver: str = "auto"
    #: CG forcing floor (relative residual). 0.0 (default) = AUTO:
    #: 3e-4 in f32 (the knee measured on the headline bench — sharply:
    #: sqrt(eps) = 3.45e-4 already creeps at the 1e-6 endgame) and
    #: sqrt(eps) ≈ 1.5e-8 in f64. Set explicitly to override.
    cg_tol: float = 0.0
    cg_maxiter: int = 250
    #: Eisenstat-Walker-style adaptive CG forcing (opt-in): per-epoch
    #: relative tolerance eta_k = clip(0.9*(s_k/s_ref)^2, cg_tol, 0.1)
    #: where s_k = ||x_k - x_{k-1}|| and s_ref is the FIRST step length —
    #: loose while the outer iterates move a lot, tightening
    #: superlinearly as the steps shrink; cg_tol acts as the floor.
    #: (Step length, not the classic gradient/rhs-norm ratio: the
    #: smoothed composite gradient does not vanish at the damped-prox
    #: fixed point, so rhs-based variants plateau — steps._forcing_tol.)
    #: NOT the default: measured at the north-star bench shape
    #: (196608×10⁴), the loose early directions it produces negate the
    #: greedy-α epoch savings (120 epochs vs 41 with the fixed auto
    #: floor — docs/STATUS.md round-3 notes); the AUTO sqrt(eps) cg_tol
    #: already encodes the measured forcing knee.
    cg_adaptive: bool = False
    #: greedy SCORE damping: per epoch, trial the UNDAMPED prox step
    #: (α = 1) and accept it iff the true composite objective f + g
    #: strictly decreases; otherwise take the SCORE-damped step (the
    #: theory-guaranteed fallback). Far from the solution the damping
    #: α = ss/(1+M_g·η) over-throttles Newton-type directions (measured:
    #: α ≈ 0.06 for the first ~40 epochs at n = 10⁴ — 2-3× the epochs);
    #: the greedy trial takes full steps there and falls back to damped
    #: exactly where damping is the right rate (near the fixed point,
    #: where the full prox step stops decreasing F). Measured at the
    #: north-star bench shape: 41 epochs / 2.71 s vs 120 / 6.70 s
    #: damped-only. Costs one extra objective evaluation per epoch (one
    #: data pass; GLM problems with loss_z reuse the step's linear
    #: predictor for F(x)). NaN-safe: a diverging trial fails the strict
    #: -decrease test and is discarded.
    #:
    #: DEFAULT None = AUTO: on for ss_type=1 AND n >= 4096. ss_type 2/3
    #: stay off — the greedy full prox step can land EXACTLY on an l1
    #: kink, where the Armijo fallback's smooth-slope test (ss_type=3)
    #: collapses α and freezes the iteration short of the optimum
    #: (observed on the reference oracle fixture). Small n stays off —
    #: the damping over-throttling greedy compensates grows as
    #: M_g ∝ n^0.2, and at n = 1024 the trial's extra data pass was
    #: measured to cost more than it saves (29 vs 21 epochs) while at
    #: n = 10112 it wins 41 vs 120. Explicit True/False always wins;
    #: False gives exact reference-trajectory parity (fixed points
    #: unchanged either way).
    greedy_alpha: Optional[bool] = None
    #: >1 splits the row-sharded CG matvec's second contraction into
    #: output-column chunks whose psums overlap the next chunk's compute
    #: (XLA async collectives) — for DCN-scale meshes with large n; the
    #: default single fused psum wins when the collective is small.
    comm_overlap_chunks: int = 1
    #: static Jacobi preconditioner (opt-in; requires
    #: scso.with_col_sumsq(prob)): approximate the per-epoch CG
    #: preconditioner diagonal as mean(w)·diag(AᵀA) instead of the exact
    #: Σᵢ wᵢAᵢⱼ² — saves ONE FULL data pass per epoch (the einsum reads
    #: all of A) at the cost of preconditioner quality only (the CG
    #: operator and solution are unchanged; exact for least squares).
    static_precond: bool = False
    #: epoch-fused greedy path — see ProxGGNSCORE.epoch_cache (newton
    #: flavor: the cache carries gres/hvp_w TRUE-Hessian weights)
    epoch_cache: Optional[bool] = None
    kernels: str = "auto"
    name: str = "prox-newtonscore"
    label: str = "Prox-N-SCORE"

    def display(self):
        # parity: set_name! renames when use_prox=false (prox-N-SCORE.jl:24-33)
        if not self.use_prox:
            return "newtonscore", "Newton-SCORE"
        return self.name, self.label


@dataclasses.dataclass(frozen=True)
class ProxGGNSCORE:
    """Proximal generalized Gauss-Newton with self-concordant regularization.

    ``solver``:
      * 'auto'  — size-aware (decided at trace time; shapes are static
        under jit). Small problems reproduce the reference's compile-time
        branch: dual form when (m·ny + 1) <= n else primal normal
        equations (prox-GGN-SCORE.jl:124-131 — the reference itself picks
        the cheaper system). Once materializing the m×n Jacobian would
        dominate, 'auto' switches to the matrix-free CG path instead of
        silently forming J (warns once per shape).
      * 'dense_dual' / 'dense_primal' — force one dense branch.
      * 'cg'    — matrix-free CG on v ↦ Jᵀ(Q(Jv)) + λ·Hr∘v via jvp/vjp
        (the scalable multi-host path; BASELINE.json "GGN-CG").
    """

    ss_type: int = 1
    use_prox: bool = True
    solver: str = "auto"
    #: CG forcing floor; 0.0 = AUTO sqrt(eps(dtype)) — see ProxNSCORE.cg_tol
    cg_tol: float = 0.0
    cg_maxiter: int = 250
    #: Eisenstat-Walker adaptive CG forcing (opt-in) — see
    #: ProxNSCORE.cg_adaptive for why it is not the default
    cg_adaptive: bool = False
    #: greedy SCORE damping; None = AUTO (on for ss_type=1 — the
    #: measured-best bench config; see ProxNSCORE.greedy_alpha)
    greedy_alpha: Optional[bool] = None
    #: precision-adaptive CG (manual knob, needs Problem.A_lp — see
    #: algorithms.mixed.with_lp_copy): epochs whose CG forcing tolerance
    #: is >= cg_lp_tol run their curvature matvecs on the low-precision
    #: data copy (bf16 halves HBM traffic); tighter epochs use full
    #: precision. RHS/gradients always use the full-precision A, so only
    #: the inexact-Newton direction error grows — bounded by the forcing
    #: tolerance itself when cg_lp_tol >> the copy's ~1e-3 matvec error.
    #: 0.0 disables (see auto_lp for the no-knob route). Sensible
    #: values: the CG floor (AUTO 3e-4 f32) under the default
    #: tightening-only forcing — bf16 through the bulk phase, f32 in
    #: the endgame; 1e-2 with cg_adaptive=True.
    #: SCALAR solves only: under vmap (sweep/solve_fleet) the batched
    #: precision cond lowers to a select that executes BOTH matvecs —
    #: correct but strictly slower; leave it off in sweeps.
    cg_lp_tol: float = 0.0
    #: AUTO precision-adaptive CG. None (default) = on in the
    #: measured-win regime: f32 (MO)GLM full-batch CG solves on a TPU
    #: backend with A >= 2 GiB per device (512 MiB for multi-output
    #: problems) and HBM headroom for the bf16 copy — `solve` then
    #: attaches Problem.A_lp itself and sets cg_lp_tol to the CG floor.
    #: Round 5: row-sharded problems qualify (A_lp rides A's row
    #: sharding; per-device footprint gates) and mglm problems qualify
    #: on the cached path (bf16 matvec via the XLA pair — the measured
    #: fastest mglm curvature operator). Measured on v5e
    #: (benchmarks/lp_ab.py): 21-23% faster at BOTH bench shapes with
    #: identical trajectories (bulk-phase bf16 curvature never cost an
    #: epoch or a CG iteration; the tightening-only endgame runs f32
    #: and pins the final accuracy). False disables AUTO (manual
    #: cg_lp_tol still honored); True skips the backend/size gates
    #: (testing). Explicit cg_lp_tol > 0 always wins over AUTO.
    auto_lp: Optional[bool] = None
    #: comm/compute overlap for the sharded CG matvec — see ProxNSCORE
    comm_overlap_chunks: int = 1
    #: static Jacobi preconditioner — see ProxNSCORE.static_precond
    static_precond: bool = False
    #: subsampled curvature (opt-in; inexact subsampled proximal Newton,
    #: arXiv:1708.08552 flavor): estimate the GGN curvature from a
    #: strided subsample of ~curvature_rows data rows while the
    #: RHS/gradient stays EXACT over all rows — every CG matvec then
    #: streams m_sub/m of the data (the dominant HBM cost). The extra
    #: direction error joins the CG forcing error; pair with
    #: cg_adaptive. 0 disables. GLM single-z path only; exclusive with
    #: cg_lp_tol (the low-precision copy has full-m shape).
    curvature_rows: int = 0
    kernels: str = "auto"
    #: single-pass epoch-prep kernel (ops/pallas/glm_prep): z + RHS
    #: pullback + Jacobi diagonal in ONE A read. None = AUTO: on for
    #: n >= 8192 — measured on v5e: WINS 2.70 s → 2.14 s at the
    #: north-star shape (n = 10112 tall-narrow tiles) but LOSES at
    #: n = 1024 (0.455 → 0.599 s; XLA's own fusion is better there,
    #: and the kernel's halved tiles cost more than they save). The
    #: 8192 threshold enables it only in the measured-win regime.
    use_fused_prep: Optional[bool] = None
    #: epoch-fused greedy path (steps.GLMCache + the dual-candidate
    #: fused_glm_prep_pair kernel): carry the GLM prep across epochs so
    #: each epoch costs ONE non-CG A-pass (the pass that is
    #: simultaneously the greedy trial objective, the damped candidate's
    #: objective, the next epoch's CG prep and the stats fval) instead
    #: of ~3.25. None (default) = AUTO: on whenever the structural
    #: requirements hold (see steps.epoch_cache_enabled — GGN-CG +
    #: greedy + full-batch single-device GLM with loss_sample); False
    #: forces the round-3 uncached path (same fixed points; trajectories
    #: may differ in ulps through the greedy accept test).
    epoch_cache: Optional[bool] = None
    name: str = "prox-ggnscore"
    label: str = "Prox-GGN-SCORE"

    def display(self):
        if not self.use_prox:
            return "ggnscore", "GGN-SCORE"
        return self.name, self.label


@dataclasses.dataclass(frozen=True)
class ProxLQNSCORE:
    """Proximal L-BFGS with self-concordant regularization.

    ``m`` is the L-BFGS memory (prox-L-BFGS-SCORE.jl:24, default 10).
    """

    ss_type: int = 1
    use_prox: bool = True
    m: int = 10
    #: greedy SCORE damping — see ProxNSCORE.greedy_alpha. Note the
    #: L-BFGS direction is not Newton-quality; expect more rejected
    #: trials (each costs a data pass) than with Newton/GGN — stays
    #: OFF by default (None on the Newton-quality methods = AUTO-on).
    greedy_alpha: bool = False
    kernels: str = "auto"
    name: str = "prox-lbfgsscore"
    label: str = "Prox-LBFGS-SCORE"

    def display(self):
        if not self.use_prox:
            return "lbfgsscore", "LBFGS-SCORE"
        return self.name, self.label


#: The method union — usable with isinstance(), mirroring the reference's
#: abstract `ProximalMethod` type (types/abstract.jl:6).
ProximalMethod = (ProxNSCORE, ProxGGNSCORE, ProxLQNSCORE)
Method = ProximalMethod  # back-compat alias
