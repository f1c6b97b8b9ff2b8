"""Canonical model/loss functions for the benchmark problem families.

These provide closed-form derivatives for the problems the reference
exercises (sparse logistic regression, least squares / group lasso,
box-constrained QP, Rosenbrock — README.md:44-272, test/test_algs.jl),
so solves avoid AD fallbacks on the hot path. All are pure jnp and
MXU-friendly: the data term is one (m×n)·(n,) matmul; everything else is
fused elementwise VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Logistic regression with ±1 labels:
#   f(A, y, x) = (1/m)·Σ log(1 + exp(−y ⊙ (A x)))
# (parity: the reference test fixture f_reg, test/test_algs.jl:10)
# ---------------------------------------------------------------------------


def logistic_f(A, y, x):
    z = y * (A @ x)
    # log(1 + exp(-z)) = softplus(-z), numerically stable
    return jnp.mean(jax.nn.softplus(-z))


def logistic_grad(A, y, x):
    z = y * (A @ x)
    s = jax.nn.sigmoid(-z)  # = exp(-z)/(1+exp(-z))
    return A.T @ (-y * s) / A.shape[0]


def logistic_hess(A, y, x):
    z = y * (A @ x)
    s = jax.nn.sigmoid(z)
    w = s * (1.0 - s)
    return (A.T * w) @ A / A.shape[0]


def logistic_hvp(A, y, x, v):
    z = y * (A @ x)
    s = jax.nn.sigmoid(z)
    w = s * (1.0 - s)
    return A.T @ (w * (A @ v)) / A.shape[0]


def sigmoid_out(A, x):
    """Model output ŷ = σ(A x) — the reference's Mfunc
    (test/test_algs.jl:11, README.md:146)."""
    return jax.nn.sigmoid(A @ x)


def logistic_loss_01(y, yhat):
    """Cross-entropy in ŷ for 0/1-coded y — the reference's second f_reg
    method (test/test_algs.jl:10): −(1/m)·Σ[y log ŷ + (1−y) log(1−ŷ)].

    NOTE the reference feeds ±1 labels into this 0/1 formula when GGN uses
    AD — reproduced deliberately (its GGN tests pass that way).
    """
    m = yhat.shape[0]
    return -jnp.sum(y * jnp.log(yhat) + (1.0 - y) * jnp.log(1.0 - yhat)) / m


def logistic_ggn_residual(A, y, yhat):
    """∇_ŷ of logistic_loss_01.

    WARNING: divides by ŷ/(1−ŷ) — overflows under f32 link saturation
    (|Ax| > 17). Reference-parity hook; prefer LOGISTIC01_GLM's stable
    product forms for large-scale solves."""
    m = yhat.shape[0]
    return (-(y / yhat) + (1.0 - y) / (1.0 - yhat)) / m


def logistic_ggn_qdiag(A, y, yhat):
    """diag ∇²_ŷ of logistic_loss_01 (it is exactly diagonal).

    WARNING: same saturation overflow as logistic_ggn_residual."""
    m = yhat.shape[0]
    return (y / yhat**2 + (1.0 - y) / (1.0 - yhat) ** 2) / m


def sigmoid_jac(A, y, yhat, x):
    """J = ∂ŷ/∂x = diag(ŷ(1−ŷ))·A."""
    return A * (yhat * (1.0 - yhat))[:, None]


def logistic_hvp_w(A, y, x):
    """GLM Hessian weights: ∇²f·v = Aᵀ(w∘(Av)) with w = σ(1−σ)/m.

    Feeds the fused single-pass normal-matvec kernel
    (scso_tpu.ops.pallas.matvec) in Newton-CG.
    """
    s = jax.nn.sigmoid(y * (A @ x))
    return s * (1.0 - s) / A.shape[0]


# ---------------------------------------------------------------------------
# Logistic regression with 0/1 labels:
#   f(A, y, x) = (1/m)·Σ [softplus(Ax) − y⊙(Ax)]  (cross-entropy in x)
#
# This is the coding the GGN pieces (logistic_loss_01 & friends) are
# actually derived for. NOTE the reference feeds ±1 labels into the 0/1
# cross-entropy when demonstrating GGN (test_algs.jl:10-11) — that makes
# diag(Q) NEGATIVE wherever y = −1, i.e. an indefinite GGN matrix, and
# diverges on any nontrivial data (it survives only the 5×2 fixture).
# Use THIS family for GGN on real problems.
# ---------------------------------------------------------------------------


def logistic01_f(A, y, x):
    z = A @ x
    return jnp.mean(jax.nn.softplus(z) - y * z)


def logistic01_grad(A, y, x):
    return A.T @ (jax.nn.sigmoid(A @ x) - y) / A.shape[0]


def logistic01_hess(A, y, x):
    s = jax.nn.sigmoid(A @ x)
    return (A.T * (s * (1.0 - s))) @ A / A.shape[0]


def logistic01_hvp_w(A, y, x):
    """w = σ'(Ax)/m — label-independent GLM Hessian weights."""
    s = jax.nn.sigmoid(A @ x)
    return s * (1.0 - s) / A.shape[0]


def logistic_ggn_w(A, y, x):
    """GGN weights: JᵀQJ·v = Aᵀ(w∘(Av)), w = (ŷ(1−ŷ))²·diag(Q).

    With ŷ = σ(Ax), J = diag(ŷ(1−ŷ))·A and Q = diag(logistic_ggn_qdiag).
    Computed in the saturation-stable product form
    w·m = y·(1−ŷ)² + (1−y)·ŷ² — the naive composition is 0·inf = NaN in
    f32 wherever |Ax| > 17 rounds ŷ to exactly 0 or 1.
    """
    z = A @ x
    s_pos = jax.nn.sigmoid(z)      # ŷ
    s_neg = jax.nn.sigmoid(-z)     # 1 − ŷ, stable at large z
    return (y * s_neg**2 + (1.0 - y) * s_pos**2) / A.shape[0]


# ---------------------------------------------------------------------------
# Least squares:  f(A, y, x) = (1/(2m))·‖A x − y‖²
# (parity: README.md group-lasso example, README.md:212-214)
# ---------------------------------------------------------------------------


def lsq_f(A, y, x):
    r = A @ x - y
    return 0.5 * jnp.sum(r * r) / A.shape[0]


def lsq_grad(A, y, x):
    return A.T @ (A @ x - y) / A.shape[0]


def lsq_hess(A, y, x):
    return A.T @ A / A.shape[0]


def linear_out(A, x):
    return A @ x


def lsq_loss(y, yhat):
    r = yhat - y
    return 0.5 * jnp.sum(r * r) / yhat.shape[0]


def lsq_ggn_residual(A, y, yhat):
    return (yhat - y) / yhat.shape[0]


def lsq_ggn_qdiag(A, y, yhat):
    return jnp.full_like(yhat, 1.0 / yhat.shape[0])


def linear_jac(A, y, yhat, x):
    return A


def lsq_hvp_w(A, y, x):
    """∇²f·v = Aᵀ(w∘(Av)) with w = 1/m for least squares."""
    return jnp.full((A.shape[0],), 1.0 / A.shape[0], x.dtype)


lsq_ggn_w = lsq_hvp_w  # J = A, Q = I/m


# ---------------------------------------------------------------------------
# Quadratic program:  f(x) = ½ xᵀQx + cᵀx
# (parity: box-QP fixture f_qp, test/test_algs.jl:87; README.md:258)
# ---------------------------------------------------------------------------


def qp_f(Q, c, x):
    return 0.5 * jnp.dot(x, Q @ x) + jnp.dot(c, x)


def qp_grad(Q, c, x):
    return 0.5 * (Q + Q.T) @ x + c


def qp_hess(Q, c, x):
    return 0.5 * (Q + Q.T)


# ---------------------------------------------------------------------------
# Rosenbrock (README quick start, README.md:48)
# ---------------------------------------------------------------------------


def rosenbrock(x):
    return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2


# ---------------------------------------------------------------------------
# GLM specs: elementwise structure over z = A·x for the single-pass step
# fast paths (scso_tpu.problems.GLMSpec)
# ---------------------------------------------------------------------------

from scso_tpu.problems import GLMSpec  # noqa: E402  (cycle-free: late import)


def _sig_dlink(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 - s)


LOGISTIC01_GLM = GLMSpec(
    link=jax.nn.sigmoid,
    dlink=_sig_dlink,
    res=lambda y, yhat: (-(y / yhat) + (1.0 - y) / (1.0 - yhat))
    / yhat.shape[0],
    qdiag=lambda y, yhat: (y / yhat**2 + (1.0 - y) / (1.0 - yhat) ** 2)
    / yhat.shape[0],
    hvp_w=lambda y, z: _sig_dlink(z) / z.shape[0],
    gres=lambda y, z: (jax.nn.sigmoid(z) - y) / z.shape[0],
    # stable product forms — σ'·res = (ŷ−y)/m and
    # σ'²·qdiag = (y(1−ŷ)² + (1−y)ŷ²)/m never divide by a saturated link
    ggn_rw=lambda y, z: (jax.nn.sigmoid(z) - y) / z.shape[0],
    ggn_w=lambda y, z: (
        y * jax.nn.sigmoid(-z) ** 2
        + (1.0 - y) * jax.nn.sigmoid(z) ** 2
    ) / z.shape[0],
    loss_z=lambda y, z: jnp.mean(jax.nn.softplus(z) - y * z),
    loss_sample=lambda y, z: jax.nn.softplus(z) - y * z,
)

LSQ_GLM = GLMSpec(
    link=lambda z: z,
    dlink=jnp.ones_like,
    res=lambda y, yhat: (yhat - y) / yhat.shape[0],
    qdiag=lambda y, yhat: jnp.full_like(yhat, 1.0 / yhat.shape[0]),
    hvp_w=lambda y, z: jnp.full_like(z, 1.0 / z.shape[0]),
    gres=lambda y, z: (z - y) / z.shape[0],
    ggn_rw=lambda y, z: (z - y) / z.shape[0],
    ggn_w=lambda y, z: jnp.full_like(z, 1.0 / z.shape[0]),
    loss_z=lambda y, z: 0.5 * jnp.sum((z - y) ** 2) / z.shape[0],
    loss_sample=lambda y, z: 0.5 * (z - y) ** 2,
)


# ---------------------------------------------------------------------------
# Poisson regression (canonical log link):
#   f(A, y, x) = (1/m)·Σ [exp(Ax) − y⊙(Ax)]   (NLL minus the log y! const)
#
# A second GLM family beyond logistic/least-squares: counts y ≥ 0,
# ŷ = exp(z) with z = A·x. The reference has no built-in losses at all
# (users pass f; problems.jl:61-81) — these follow the same pattern as
# the logistic family so Poisson problems get the single-z GGN-CG fast
# path and the fused kernels. NOTE exp overflows f32 at z ≈ 88; keep x0
# and data scaled so the linear predictor stays moderate (standard for
# Poisson NLL — the objective itself is exponential in z).
# ---------------------------------------------------------------------------


def poisson_f(A, y, x):
    z = A @ x
    return jnp.mean(jnp.exp(z) - y * z)


def poisson_grad(A, y, x):
    return A.T @ (jnp.exp(A @ x) - y) / A.shape[0]


def poisson_hess(A, y, x):
    w = jnp.exp(A @ x)
    return (A.T * w) @ A / A.shape[0]


def poisson_hvp_w(A, y, x):
    """GLM Hessian weights: ∇²f·v = Aᵀ(w∘(Av)), w = exp(Ax)/m."""
    return jnp.exp(A @ x) / A.shape[0]


def exp_out(A, x):
    """Model output ŷ = exp(A x) — the canonical Poisson mean."""
    return jnp.exp(A @ x)


def poisson_loss(y, yhat):
    """(1/m)·Σ [ŷ − y log ŷ] — Poisson NLL in ŷ."""
    return jnp.mean(yhat - y * jnp.log(yhat))


def poisson_ggn_residual(A, y, yhat):
    """∇_ŷ of poisson_loss: (1 − y/ŷ)/m."""
    return (1.0 - y / yhat) / yhat.shape[0]


def poisson_ggn_qdiag(A, y, yhat):
    """diag ∇²_ŷ of poisson_loss: (y/ŷ²)/m."""
    return y / yhat**2 / yhat.shape[0]


def exp_jac(A, y, yhat, x):
    """J = ∂ŷ/∂x = diag(exp(Ax))·A = diag(ŷ)·A."""
    return A * yhat[:, None]


def poisson_ggn_w(A, y, x):
    """GGN weights: w = ŷ²·qdiag = y/m — exactly the counts, no link
    evaluation at all (the product form cancels both exponentials)."""
    return jnp.broadcast_to(y / A.shape[0], (A.shape[0],))


POISSON_GLM = GLMSpec(
    link=jnp.exp,
    dlink=jnp.exp,
    res=lambda y, yhat: (1.0 - y / yhat) / yhat.shape[0],
    qdiag=lambda y, yhat: y / yhat**2 / yhat.shape[0],
    hvp_w=lambda y, z: jnp.exp(z) / z.shape[0],
    gres=lambda y, z: (jnp.exp(z) - y) / z.shape[0],
    # product forms: ŷ·res = (ŷ−y)/m (no division) and ŷ²·qdiag = y/m
    # (both exponentials cancel — exact for any z where ŷ is finite)
    ggn_rw=lambda y, z: (jnp.exp(z) - y) / z.shape[0],
    ggn_w=lambda y, z: jnp.broadcast_to(y / z.shape[0], z.shape),
    loss_z=lambda y, z: jnp.mean(jnp.exp(z) - y * z),
    loss_sample=lambda y, z: jnp.exp(z) - y * z,
)


# ---------------------------------------------------------------------------
# Multinomial (softmax) regression — VECTOR-valued model outputs.
#   W = x.reshape(p, k);  ŷ = softmax(A·W) rows (m, k);  one-hot y (m, k)
#   f(A, y, x) = (1/m)·Σᵢ [logsumexp(zᵢ) − yᵢ·zᵢ],  z = A·W
#
# The reference's GGN step supports ny outputs per sample through its
# (m·ny)×n augmented Jacobian (prox-GGN-SCORE.jl:114-135, qdm1 = m·ny);
# our dense GGN branches flatten J/residual/Q the same way. With THIS
# split (ŷ = probabilities, loss = −Σ y⊙log ŷ/m) Q = ∇²_ŷ f happens to
# be diagonal (y_ij/ŷ_ij²/m) — the classic non-diagonal diag(p) − ppᵀ
# curvature belongs to the LOGITS split, implemented matrix-free by
# MULTINOM_MGLM below (Problem.mglm): per-sample k×k curvature actions,
# scalable to sizes where the dense J is infeasible. The dense branches
# (solver='dense_dual'/'dense_primal') remain for reference parity.
# ---------------------------------------------------------------------------


def softmax_out(A, x):
    """ŷ (m, k): softmax rows of A·W with W = x.reshape(A.shape[1], -1)."""
    return jax.nn.softmax(A @ x.reshape(A.shape[1], -1), axis=-1)


def xent_loss(y, yhat):
    """−(1/m)·Σ y⊙log ŷ with one-hot y (m, k)."""
    return -jnp.sum(y * jnp.log(yhat + 1e-12)) / y.shape[0]


def multinom_f(A, y, x):
    """Softmax cross-entropy in x — the logsumexp form is exact and
    saturation-stable (no log of a rounded-to-0 probability)."""
    z = A @ x.reshape(A.shape[1], -1)
    return (jnp.sum(jax.nn.logsumexp(z, axis=-1)) - jnp.sum(y * z)
            ) / A.shape[0]


def multinom_grad(A, y, x):
    """∇_x f = vec(Aᵀ(ŷ − y))/m."""
    p = jax.nn.softmax(A @ x.reshape(A.shape[1], -1), axis=-1)
    return ((A.T @ (p - y)) / A.shape[0]).reshape(-1)


def _softmax_quad(y, Z, U):
    """Per-sample softmax curvature action: Qᵢuᵢ = (diag(pᵢ) − pᵢpᵢᵀ)uᵢ/m
    — the classic logits-split curvature, applied rowwise without ever
    forming the m k×k blocks."""
    P = jax.nn.softmax(Z, axis=-1)
    PU = P * U
    return (PU - P * jnp.sum(PU, axis=-1, keepdims=True)) / Z.shape[0]


from scso_tpu.problems import MOGLMSpec  # noqa: E402


#: Multinomial softmax regression over the LOGITS split Z = A·W — the
#: matrix-free multi-output path (each CG matvec = two m×p×k matmuls; the
#: dense (m·k)×n Jacobian of the reference's augmented GGN system,
#: prox-GGN-SCORE.jl:114-135, is never formed). Because f is convex in Z
#: and Z is linear in x, AᵀQA is the EXACT Hessian: ProxGGNSCORE(cg) on
#: this spec is full Newton-CG on the multinomial cross-entropy.
MULTINOM_MGLM = MOGLMSpec(
    n_out=0,  # placeholder; build per-k with multinom_mglm(k)
    gres=lambda y, Z: (jax.nn.softmax(Z, axis=-1) - y) / Z.shape[0],
    quad=_softmax_quad,
    qdiag_w=lambda y, Z: (lambda P: P * (1.0 - P))(
        jax.nn.softmax(Z, axis=-1)) / Z.shape[0],
    loss_z=lambda y, Z: (jnp.sum(jax.nn.logsumexp(Z, axis=-1))
                         - jnp.sum(y * Z)) / Z.shape[0],
    loss_sample=lambda y, Z: (jax.nn.logsumexp(Z, axis=-1)
                              - jnp.sum(y * Z, axis=-1)),
)


def multinom_mglm(k: int) -> MOGLMSpec:
    """The multinomial MOGLMSpec for k classes (n_out is static — it
    fixes the x.reshape(n_features, k) layout)."""
    return MULTINOM_MGLM._replace(n_out=int(k))
