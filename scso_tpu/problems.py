"""Problem containers: minimize f(x) + g(x).

TPU-native re-design of the reference's mutable `Problem`/`ProblemGeneric`
structs (/root/reference/src/problems.jl:5-40): a frozen pytree dataclass
whose array fields (data, iterates, penalties, bounds) are traced leaves
and whose callables (f, derivatives, model output fn) are static pytree
metadata — so a `Problem` can be passed straight through `jax.jit`,
`jax.vmap` (λ/μ sweeps) and `jax.device_put` (sharding the data matrix).

Derivative fallbacks: where the reference falls back to ForwardDiff
(prox-N-SCORE.jl:57-65, prox-GGN-SCORE.jl:50-56), we use `jax.grad` /
`jax.hessian` / `jax.jacfwd` — reverse-mode for gradients and
matrix-free jvp/vjp pairs for the scalable GGN-CG path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from typing import NamedTuple

from scso_tpu._src.struct import pytree_dataclass, static_field
from scso_tpu.ops.groups import Groups
from scso_tpu.ops.regularizers import reg_value


class GLMSpec(NamedTuple):
    """Generalized-linear-model structure: everything derived from z = A·x.

    Declaring this on a Problem lets the GGN/Newton steps compute the
    linear predictor ONCE per step and derive output, residual, curvature
    and CG weights from it elementwise — removing redundant full-data
    passes that the generic out_fn/grad_fy interface forces.

    Fields (all elementwise in z / yhat):
      link:   z -> yhat                  (model output, e.g. sigmoid)
      dlink:  z -> dyhat/dz              (link derivative)
      res:    (y, yhat) -> dloss/dyhat   (GGN residual)
      qdiag:  (y, yhat) -> d2loss/dyhat2 (diagonal GGN curvature)
      hvp_w:  (y, z) -> w with ∇²f·v = Aᵀ(w∘(Av)) (Newton weights)
      gres:   (y, z) -> u with ∇f = Aᵀu   (gradient residual)

    Optional STABLE product forms (highly recommended — the naive
    compositions overflow in f32 under link saturation, e.g. logistic
    1/(1−ŷ)² at z > 17 gives w = σ'²·q = 0·inf = NaN):
      ggn_rw: (y, z) -> σ'·res   (GGN RHS weights;  J = diag(σ')A)
      ggn_w:  (y, z) -> σ'²·qdiag (GGN matvec weights)
    """

    link: Callable
    dlink: Callable
    res: Callable
    qdiag: Callable
    hvp_w: Callable
    gres: Callable
    ggn_rw: Optional[Callable] = None
    ggn_w: Optional[Callable] = None
    #: True ⇒ the residual/weight fns divide by z.shape[0] (the 1/m loss
    #: normalization). Required so tiled kernels (which see per-tile
    #: shapes) can rescale to the true m — see ops/pallas/glm_prep.
    sample_normalized: bool = True
    #: (y, z) -> f value at z = A·x, SAME scale as Problem.f — lets the
    #: greedy-α trial (methods' ``greedy_alpha``) evaluate the composite
    #: objective from one linear-predictor pass instead of calling f.
    loss_z: Optional[Callable] = None
    #: PER-SAMPLE loss ℓ(y, z), elementwise and UNNORMALIZED — the
    #: tileable form of ``loss_z``: when ``sample_normalized``,
    #: loss_z(y, z) == sum(loss_sample(y, z)) / len(z) (plain sum
    #: otherwise). Declaring it unlocks the epoch-fused greedy path
    #: (ops/pallas/glm_prep.fused_glm_prep_pair): the greedy trial, the
    #: next epoch's CG prep AND the stats objective all come from ONE
    #: pass over A (steps._greedy_update_cached).
    loss_sample: Optional[Callable] = None


class MOGLMSpec(NamedTuple):
    """Multi-output GLM structure: everything derived from Z = A·W with
    W = x.reshape(n_features, n_out) — the scalable path for VECTOR model
    outputs (e.g. multinomial/softmax regression, k classes per sample).

    The reference's GGN handles m·ny vector outputs only by materializing
    the (m·ny)×n augmented Jacobian (prox-GGN-SCORE.jl:114-135, qdm1 =
    m·ny); this spec replaces that with per-sample k×k curvature actions
    applied matrix-free — each CG matvec is two (m×p)·(p×k) MXU matmuls
    plus elementwise work, never forming J. With the LOGITS split (loss
    convex in Z, model linear in x) the GGN operator AᵀQA is the EXACT
    Hessian of f(x), so ProxGGNSCORE(solver='cg') on an MOGLMSpec problem
    is full Newton-CG.

    Fields (Z is (m, k); all per-sample/rowwise):
      n_out:   k — outputs per sample (static).
      gres:    (y, Z) -> (m, k) residual dL/dZ (so ∇f = vec(Aᵀ·gres)).
      quad:    (y, Z, U) -> (m, k) curvature action Q(Z)[U] — for softmax
               cross-entropy: (P∘U − P·rowsum(P∘U))/m with P = softmax(Z).
      qdiag_w: (y, Z) -> (m, k) diag of the per-sample curvature blocks —
               Jacobi preconditioner weights (diag(AᵀQA) ≈ Σᵢ wᵢ Aᵢⱼ²).
      loss_z:  optional (y, Z) -> f value (same scale as Problem.f) for
               the greedy-α trial's one-pass objective.
    """

    n_out: int
    gres: Callable
    quad: Callable
    qdiag_w: Callable
    loss_z: Optional[Callable] = None
    #: PER-SAMPLE loss ℓ(y, Z) -> (m,), unnormalized — the rowwise form
    #: of ``loss_z`` (when ``sample_normalized``, loss_z == sum/m).
    #: Declaring it unlocks the epoch-fused greedy path for multi-output
    #: problems (steps.MOGLMCache).
    loss_sample: Optional[Callable] = None
    #: True ⇒ gres/quad/qdiag_w divide by Z.shape[0] (the 1/m loss
    #: normalization) — same contract as GLMSpec.sample_normalized.
    sample_normalized: bool = True


@pytree_dataclass
class Problem:
    """Composite convex problem: minimize f(x) + λ·g(x).

    Two flavours mirror the reference:
      * generic (no data): ``f(x)`` — reference ProblemGeneric
        (problems.jl:5-19); build with :func:`make_problem`.
      * data-driven: ``f(A, y, x)`` over a data matrix — reference Problem
        (problems.jl:21-40); build with :func:`make_problem` passing A, y.

    Array fields are pytree leaves; callables are static metadata.
    ``x_star`` is the reference's ``sol`` kwarg stored in ``model.x``
    (problems.jl:49,70) — the ground truth used for relative-error
    reporting, defaulting to zeros.
    """

    # --- traced leaves -------------------------------------------------
    x0: jax.Array
    lam: jax.Array
    A: Optional[jax.Array] = None
    y: Optional[jax.Array] = None
    Atest: Optional[jax.Array] = None
    ytest: Optional[jax.Array] = None
    L: Optional[jax.Array] = None
    x_star: Optional[jax.Array] = None
    lb: Optional[jax.Array] = None
    ub: Optional[jax.Array] = None
    groups: Optional[Groups] = None
    #: optional precomputed column sum-of-squares diag(AᵀA) (build with
    #: scso.with_col_sumsq) — enables the STATIC Jacobi preconditioner
    #: (ProxGGNSCORE/ProxNSCORE ``static_precond=True``): the per-epoch
    #: exact diagonal Σᵢ wᵢAᵢⱼ² costs a full extra A pass; the static
    #: approximation mean(w)·diag(AᵀA) costs O(m+n) per epoch and only
    #: affects preconditioner QUALITY (same CG fixed point).
    col_sumsq: Optional[jax.Array] = None
    #: optional LOW-PRECISION copy of A (usually bfloat16 — build with
    #: algorithms.mixed.with_lp_copy) for precision-adaptive CG: while
    #: the CG forcing tolerance is looser than the copy's matvec error,
    #: curvature matvecs stream A_lp at half the HBM traffic
    #: (ProxGGNSCORE.cg_lp_tol). RHS/gradients always use the full-
    #: precision A. No reference analogue (pure-f64 Julia).
    A_lp: Optional[jax.Array] = None

    # --- static metadata ------------------------------------------------
    f: Optional[Callable] = static_field(default=None)
    loss_fn: Optional[Callable] = static_field(default=None)  # f(y, yhat) for GGN
    out_fn: Optional[Callable] = static_field(default=None)   # model output M(A, x)
    grad_fx: Optional[Callable] = static_field(default=None)
    hess_fx: Optional[Callable] = static_field(default=None)
    jac_yx: Optional[Callable] = static_field(default=None)
    grad_fy: Optional[Callable] = static_field(default=None)
    hess_fy: Optional[Callable] = static_field(default=None)
    hess_fy_diag: Optional[Callable] = static_field(default=None)  # scalable GGN
    # GLM structure hooks for the fused Pallas normal-matvec path
    # (ops/pallas/matvec.py): when f is a GLM over the design matrix A,
    #   ∇²f(x)·v   = Aᵀ(hvp_w ∘ (A·v))   with hvp_w = hvp_w(As, ys, x)
    #   JᵀQJ·v     = Aᵀ(ggn_w ∘ (A·v))   with ggn_w = ggn_w(As, ys, x)
    # so one A-tile pass computes the whole CG matvec.
    hvp_w: Optional[Callable] = static_field(default=None)
    ggn_w: Optional[Callable] = static_field(default=None)
    glm: Optional[GLMSpec] = static_field(default=None)
    #: multi-output GLM structure (vector outputs per sample) — the
    #: matrix-free path for multinomial-style models; see MOGLMSpec
    mglm: Optional[MOGLMSpec] = static_field(default=None)
    # set by parallel.shard_problem: the mesh/axis the data rows are
    # sharded over (static — jax.sharding.Mesh is hashable), letting the
    # steps route matvecs through the shard_map'd fused kernel
    mesh: Optional[object] = static_field(default=None)
    data_axis: Optional[str] = static_field(default=None)
    name: Optional[str] = static_field(default=None)
    has_data: bool = static_field(default=False)
    #: set by make_problem(pad_features=True): the UNPADDED feature count.
    #: The stored arrays are zero-padded along the feature axis to a
    #: multiple of 128 so the fused Pallas kernels engage at ragged n
    #: (e.g. n = 10^4); padded coordinates provably stay exactly 0 for
    #: l1/l2/no-prox solves and Solution.x is sliced back to n_true.
    n_true: Optional[int] = static_field(default=None)

    # --- reference-compatible aliases ------------------------------------
    @property
    def x(self):
        """Ground-truth/solution vector (reference `model.x`)."""
        return self.x_star

    @property
    def n(self) -> int:
        return self.x0.shape[-1]

    # --- f and derivatives (with AD fallbacks) ---------------------------

    def f_val(self, As, ys, x):
        """f at x on the given batch (full data by default)."""
        if self.has_data:
            return self.f(As, ys, x)
        return self.f(x)

    def grad_f(self, As, ys, x):
        """∇f — user `grad_fx` or `jax.grad` fallback.

        Parity: prox-N-SCORE.jl:49-65 (user fn else ForwardDiff.gradient).
        """
        if self.grad_fx is not None:
            return self.grad_fx(As, ys, x) if self.has_data else self.grad_fx(x)
        return jax.grad(lambda v: self.f_val(As, ys, v))(x)

    def hess_f(self, As, ys, x):
        """∇²f — user `hess_fx` or `jax.hessian` fallback."""
        if self.hess_fx is not None:
            return self.hess_fx(As, ys, x) if self.has_data else self.hess_fx(x)
        return jax.hessian(lambda v: self.f_val(As, ys, v))(x)

    def hvp_f(self, As, ys, x, v):
        """Matrix-free Hessian-vector product ∇²f(x)·v via forward-over-
        reverse — the scalable Newton-CG path (no n×n materialization)."""
        g = lambda u: self.grad_f(As, ys, u)
        return jax.jvp(g, (x,), (v,))[1]

    # --- GGN pieces -------------------------------------------------------

    def out(self, As, x):
        if self.out_fn is None:
            raise ValueError("ProxGGNSCORE requires out_fn on the problem")
        return self.out_fn(As, x)

    def ggn_pieces(self, As, ys, x):
        """(yhat, J, residual, Q) for the dense GGN step.

        Parity: prox-GGN-SCORE.jl:44-56 — user (jac_yx, grad_fy, hess_fy)
        or AD of out_fn / loss_fn.
        """
        yhat = self.out(As, x)
        if all(fn is not None for fn in (self.jac_yx, self.grad_fy, self.hess_fy)):
            J = self.jac_yx(As, ys, yhat, x)
            residual = self.grad_fy(As, ys, yhat)
            Q = self.hess_fy(As, ys, yhat)
            return yhat, J, residual, Q
        if self.loss_fn is None:
            raise ValueError(
                "GGN AD fallback requires loss_fn(y, yhat) on the problem "
                "(the reference's second f method, README.md:141-146)"
            )
        J = jax.jacfwd(lambda v: self.out(As, v))(x)
        residual = jax.grad(lambda yh: self.loss_fn(ys, yh))(yhat)
        Q = jax.hessian(lambda yh: self.loss_fn(ys, yh))(yhat)
        return yhat, J, residual, Q

    def ggn_residual_qdiag(self, As, ys, x):
        """(yhat, residual, q_diag) for the matrix-free GGN-CG path.

        Uses `hess_fy_diag` when available (elementwise losses have a
        diagonal Q), else extracts the diagonal of the dense AD Hessian.
        """
        yhat = self.out(As, x)
        if self.grad_fy is not None:
            residual = self.grad_fy(As, ys, yhat)
        elif self.loss_fn is not None:
            residual = jax.grad(lambda yh: self.loss_fn(ys, yh))(yhat)
        else:
            raise ValueError("GGN requires grad_fy or loss_fn")
        if self.hess_fy_diag is not None:
            q_diag = self.hess_fy_diag(As, ys, yhat)
        elif self.hess_fy is not None:
            q_diag = jnp.diagonal(self.hess_fy(As, ys, yhat))
        elif self.loss_fn is not None:
            q_diag = jnp.diagonal(
                jax.hessian(lambda yh: self.loss_fn(ys, yh))(yhat)
            )
        else:
            raise ValueError("GGN requires hess_fy(_diag) or loss_fn")
        return yhat, residual, q_diag

    def jvp_out(self, As, x, v):
        """J·v without materializing J."""
        return jax.jvp(lambda u: self.out(As, u), (x,), (v,))[1]

    def vjp_out(self, As, x):
        """Returns (yhat, fn u -> Jᵀ·u) without materializing J."""
        yhat, vjp = jax.vjp(lambda u: self.out(As, u), x)
        return yhat, lambda u: vjp(u)[0]

    # --- regularizer ------------------------------------------------------

    def reg(self, reg_name: str, x):
        return reg_value(
            reg_name, x, lam=self.lam, lb=self.lb, ub=self.ub, groups=self.groups
        )

    def obj(self, reg_name: str, x, As=None, ys=None):
        As = self.A if As is None else As
        ys = self.y if ys is None else ys
        return self.f_val(As, ys, x) + self.reg(reg_name, x)


def with_col_sumsq(prob: Problem) -> Problem:
    """Attach diag(AᵀA) (one data pass, computed once) for the static
    Jacobi preconditioner (``static_precond=True`` on ProxGGNSCORE /
    ProxNSCORE) — the per-epoch exact preconditioner diagonal otherwise
    costs a full extra A read per epoch."""
    if prob.A is None:
        raise ValueError("with_col_sumsq requires a data problem")
    from scso_tpu._src.struct import replace as dc_replace

    return dc_replace(prob, col_sumsq=jnp.einsum(
        "ij,ij->j", prob.A, prob.A))


class Interval(NamedTuple):
    """Closed interval [lower, upper] — the reference's IntervalSets
    surface (types/custom.jl:26-27). Accepted as ``C_set`` either as one
    scalar interval or a tuple/list of per-coordinate intervals
    (prox-operators.jl:33-43, regularizers.jl:10-18). Any object with
    ``lower``/``upper`` attributes works too."""

    lower: float
    upper: float


def is_interval_set(obj) -> bool:
    """True for an Interval (or .lower/.upper object) or a tuple/list of
    them — parity: is_interval_set (types/custom.jl:27)."""
    has_lu = lambda o: hasattr(o, "lower") and hasattr(o, "upper")
    if has_lu(obj):
        return True
    return (isinstance(obj, (tuple, list)) and len(obj) > 0
            and all(has_lu(o) for o in obj))


def _resolve_bounds(C_set, dtype):
    """Normalize C_set into broadcastable (lb, ub) arrays.

    Accepted forms (parity: IntervalVectorTupleOrNothing,
    types/custom.jl:26, and the prox/reg unpacking at
    prox-operators.jl:33-43):
      * ``[lb, ub]`` / ``(lb, ub)`` — scalars or length-n arrays;
      * one :class:`Interval` (scalar bounds);
      * a tuple/list of n :class:`Interval` — per-coordinate bounds.
    Bare nested sequences keep the [lb, ub] meaning (the reference
    disambiguates per-coordinate intervals by TYPE, never by length).

    Unlike the smoother-side `sanitize_bounds`, infinities are KEPT here:
    the reference's `get_reg`/prox use the raw C_set (regularizers.jl:9-19,
    prox-operators.jl:27-46); only smoothers cache ±inf to ±1e32.
    """
    if C_set is None:
        return None, None
    if is_interval_set(C_set):
        if hasattr(C_set, "lower"):  # one scalar interval
            lo, hi = C_set.lower, C_set.upper
            return (jnp.asarray(min(lo, hi), dtype=dtype),
                    jnp.asarray(max(lo, hi), dtype=dtype))
        # per-coordinate intervals
        lows = [min(i.lower, i.upper) for i in C_set]
        highs = [max(i.lower, i.upper) for i in C_set]
        return (jnp.asarray(lows, dtype=dtype),
                jnp.asarray(highs, dtype=dtype))
    lb, ub = C_set[0], C_set[1]
    return jnp.asarray(lb, dtype=dtype), jnp.asarray(ub, dtype=dtype)


class ProblemLike:
    """Empty placeholder model — parity: ``Problem()`` → ProblemLike
    (problems.jl:3,42). Carries no state; exists so the zero-argument
    constructor arity of the reference keeps working."""

    def __repr__(self):
        return "ProblemLike()"


def make_problem(
    *args,
    Atest=None,
    ytest=None,
    L=None,
    sol=None,
    C_set=None,
    P: Optional[Groups] = None,
    groups: Optional[Groups] = None,
    out_fn=None,
    loss_fn=None,
    grad_fx=None,
    hess_fx=None,
    jac_yx=None,
    grad_fy=None,
    hess_fy=None,
    hess_fy_diag=None,
    hvp_w=None,
    ggn_w=None,
    glm=None,
    mglm=None,
    name=None,
    dtype=None,
    pad_features=False,
) -> Problem:
    """Build a :class:`Problem` — mirrors the reference's constructors.

    Call shapes (parity: problems.jl:44-59 and :61-81):
      * ``make_problem(x0, f, lam, ...)`` — generic problem, ``f(x)``.
      * ``make_problem(A, y, x0, f, lam, ...)`` — data problem,
        ``f(A, y, x)``.

    ``P``/``groups`` accept a :class:`~scso_tpu.ops.groups.Groups`
    (the reference's `get_P` object). ``sol`` is stored as ``x_star``
    (ground truth for relative errors), defaulting to zeros — the
    reference's quirk at problems.jl:49,70, reproduced deliberately.
    """
    if len(args) == 0:
        # parity: Problem() → ProblemLike (problems.jl:42)
        return ProblemLike()
    if len(args) == 3:
        x0, f, lam = args
        A = y = None
        has_data = False
    elif len(args) == 5:
        A, y, x0, f, lam = args
        has_data = True
    else:
        raise TypeError(
            "make_problem takes (), (x0, f, lam, ...) or "
            "(A, y, x0, f, lam, ...)"
        )

    grp = groups if groups is not None else P

    # Pad BEFORE the device transfer: at north-star scale A is ~8 GiB on a
    # 16 GiB chip, so a device-side pad (original + padded alive during the
    # concatenate) exhausts HBM. Host (numpy) inputs are padded in host RAM
    # into a fresh zero buffer; already-device inputs fall back to a device
    # concatenate (caller keeps A small or pre-padded in that case).
    n_true = None
    if pad_features:
        n = np.shape(x0)[-1]
        pad = (-n) % 128
        if pad:
            # Guards only matter when padding actually happens: on an
            # already-128-aligned n the call is a no-op for every
            # problem kind.
            if not has_data:
                raise ValueError(
                    "pad_features requires a data problem (A, y): only "
                    "a zero-padded data matrix neutralizes the padded "
                    "coordinates — a generic f(x) sees them as real "
                    "variables and silently optimizes over them"
                )
            if C_set is not None:
                raise ValueError(
                    "pad_features cannot be combined with box bounds "
                    "(C_set): the indbox prox clamps the padded "
                    "coordinates into [lb, ub], making them nonzero real "
                    "variables"
                )
            if grp is not None:
                # grouped problems: pad with ONE dedicated zero-weight
                # group. Zeros are exactly preserved end-to-end: the
                # zero-padded A keeps gradient/CG-rhs pads at 0 (CG then
                # preserves the zero pattern), the GL smoother's
                # chain-rule grad/hess carry the element weight (0 on
                # pads), and both prox stages map 0 -> 0 (soft-threshold
                # of 0; group scaling of an all-zero group). Tested in
                # tests/test_group_lasso_e2e.py.
                from scso_tpu.ops.groups import make_groups

                seg = np.asarray(grp.segment_ids)
                seg_pad = np.concatenate(
                    [seg, np.full((pad,), grp.n_groups, dtype=np.int32)])
                w = np.asarray(grp.weights)
                w_pad = np.concatenate([w, np.zeros((1,), dtype=w.dtype)])
                grp = make_groups(seg_pad, w_pad,
                                  n_groups=grp.n_groups + 1,
                                  dtype=w.dtype)
            if mglm is not None:
                raise ValueError(
                    "pad_features cannot be combined with mglm: padding "
                    "appends to the FLAT x while the multi-output model "
                    "reads x.reshape(n_features, n_out) — the pad would "
                    "scramble the (features, outputs) layout"
                )
            n_true = n

            def zpad(v):
                if v is None:
                    return None
                if isinstance(v, jax.Array):
                    return jnp.concatenate(
                        [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)],
                        axis=-1)
                vv = np.asarray(v)
                out = np.zeros(vv.shape[:-1] + (vv.shape[-1] + pad,),
                               dtype=vv.dtype)
                out[..., :vv.shape[-1]] = vv
                return out

            x0 = zpad(x0)
            sol = zpad(sol)
            A = zpad(A)
            Atest = zpad(Atest)

    x0 = jnp.asarray(x0, dtype=dtype)
    dt = x0.dtype
    lam = jnp.asarray(lam, dtype=dt)
    to = lambda v: None if v is None else jnp.asarray(v, dtype=dt)
    A, y, Atest, ytest = to(A), to(y), to(Atest), to(ytest)
    x_star = to(sol) if sol is not None else jnp.zeros_like(x0)
    lb, ub = _resolve_bounds(C_set, dt)
    L = None if L is None else jnp.asarray(L, dtype=dt)

    return Problem(
        x0=x0,
        lam=lam,
        A=A,
        y=y,
        Atest=Atest,
        ytest=ytest,
        L=L,
        x_star=x_star,
        lb=lb,
        ub=ub,
        groups=grp,
        f=f,
        loss_fn=loss_fn,
        out_fn=out_fn,
        grad_fx=grad_fx,
        hess_fx=hess_fx,
        jac_yx=jac_yx,
        grad_fy=grad_fy,
        hess_fy=hess_fy,
        hess_fy_diag=hess_fy_diag,
        hvp_w=hvp_w,
        ggn_w=ggn_w,
        glm=glm,
        mglm=mglm,
        name=name,
        has_data=has_data,
        n_true=n_true,
    )
