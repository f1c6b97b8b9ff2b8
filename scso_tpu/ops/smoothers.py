"""Self-concordant smoothing functions h_mu (the SCORE smoother families).

TPU-native re-design of the reference smoother layer
(/root/reference/src/regularizers/{smoothing,phuber-smooth,
ostrovskii-bach-smooth,exponential-smooth,log-exp-smooth}.jl).

Each smoother is a frozen pytree dataclass carrying its smoothing
parameter ``mu`` (a traced leaf, so regularization-path sweeps can `vmap`
over it) and its generalized self-concordance constants ``(Mh, nu)`` as
static metadata. The de-facto interface mirrors the reference's six-field
structs (mu, Mh, nu, val, grad, hess — e.g. phuber-smooth.jl:20-27):

  - ``val(x, cw)``        — elementwise smoothed-regularizer value
  - ``grad(x, cw)``       — elementwise gradient
  - ``hess_diag(x, cw)``  — the DIAGONAL of the smoother Hessian

``cw`` is the diagonal of the reference's group structure matrix ``Cmat``
(an elementwise weight vector — see scso_tpu.ops.groups); non-group
smoothers ignore it, exactly as the reference closures ignore their Cmat
argument (phuber-smooth.jl:34).

All functions are pure jnp expressions: no data-dependent Python control
flow, everything branchless via `jnp.where`, so XLA fuses the whole
smoother evaluation into neighbouring kernels.

Documented divergences from the reference (behavioural fixes, see
SURVEY.md §7 "semantics to decide deliberately"):
  * `PHuberSmootherIndBox.grad` implements the true derivative of the
    smoother value. The reference's `huber_grad_indbox`
    (phuber-smooth.jl:84-98) tests ``-x < a`` instead of ``x < a`` and
    returns the sign-flipped quantity ``(a-x)/sqrt(...)``; both are latent
    bugs that its own test suite never exercises (the box-QP test uses
    λ=1e-4, making the term negligible).
  * `LogExpSmootherIndBox.val` evaluates the log-barrier term with the
    absolute distance to the bound; the reference's expression
    (log-exp-smooth.jl:44) takes `log` of a negative number below the
    lower bound (a DomainError in Julia).
  * `LogExpSmootherIndBox.hess_diag` is floored at machine eps: the
    reference returns exactly 0 strictly inside both margins
    (log-exp-smooth.jl:57-61), which poisons the step damping with
    0 * inf = NaN when inverted.
  * `NoSmooth` carries (Mh, nu) = (0, 2) so that Mg = 0 and the damped
    step reduces to the undamped one; the reference's NoSmooth struct has
    no Mh/nu fields at all and cannot be used with any method
    (smoothing.jl:2-9).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from scso_tpu._src.struct import pytree_dataclass, static_field
from scso_tpu.ops.groups import Groups, group_norms, spread


def _eps(dtype) -> float:
    """Machine epsilon of the compute dtype (Julia `eps()` analogue)."""
    return float(jnp.finfo(dtype).eps)


# ---------------------------------------------------------------------------
# Step-damping constant M_g  (parity: get_Mg, smoothing.jl:12-26)
# ---------------------------------------------------------------------------


def get_Mg(Mh, nu, mu, n: int):
    """Generalized self-concordance step-damping constant.

    M_g = n^((3-nu)/2) * mu^(nu/2 - 2) * Mh     for 0 < nu <= 3
    M_g = mu^(4 - 3*nu/2) * Mh                  for nu > 3

    ``mu`` may be a traced array (so λ/μ sweeps can vmap over it); the
    eager positivity checks only fire for concrete python scalars, mirroring
    the reference's `Base.error` validations (smoothing.jl:13-15, 24).
    """
    if isinstance(Mh, (int, float)) and Mh < 0:
        raise ValueError("Mh must be nonnegative.")
    if isinstance(mu, (int, float)) and mu <= 0:
        raise ValueError("mu must be positive.")
    if not 0 < nu:
        raise ValueError("nu must be positive.")
    if nu <= 3:
        return n ** ((3.0 - nu) / 2.0) * mu ** (nu / 2.0 - 2.0) * Mh
    return mu ** (4.0 - 3.0 * nu / 2.0) * Mh


# ---------------------------------------------------------------------------
# Bounds handling  (parity: bounds_sanity_check, prox-reg-utils.jl:144-159)
# ---------------------------------------------------------------------------

L_INF_CACHE = -1e32
U_INF_CACHE = 1e32


def sanitize_bounds(lb, ub, n: Optional[int] = None):
    """Broadcast box bounds and cache infinities to ±1e32.

    Accepts scalars or length-n vectors, mirroring bounds_sanity_check.
    Returns numpy arrays (construction-time, host-side).
    """
    a = np.atleast_1d(np.asarray(lb, dtype=np.float64))
    b = np.atleast_1d(np.asarray(ub, dtype=np.float64))
    if n is not None:
        if a.size == 1:
            a = np.full((n,), a[0])
        if b.size == 1:
            b = np.full((n,), b[0])
        if a.size != n or b.size != n:
            raise ValueError(
                "Lengths of the bounds do not match that of the variable."
            )
    a = np.where(np.isneginf(a), L_INF_CACHE, a)
    b = np.where(np.isposinf(b), U_INF_CACHE, b)
    return a, b


# ---------------------------------------------------------------------------
# Base class
# ---------------------------------------------------------------------------


class SmootherBase:
    """Common helpers; subclasses define val/grad/hess_diag."""

    #: self-concordance constants — static class attributes, overridden
    Mh: float = 0.0
    nu: float = 2.0

    def val(self, x, cw=None):
        raise NotImplementedError

    def grad(self, x, cw=None):
        raise NotImplementedError

    def hess_diag(self, x, cw=None):
        raise NotImplementedError

    def Mg(self, n: int):
        return get_Mg(self.Mh, self.nu, self.mu, n)


# ---------------------------------------------------------------------------
# NoSmooth  (parity: smoothing.jl:2-9)
# ---------------------------------------------------------------------------


@pytree_dataclass
class NoSmooth(SmootherBase):
    """Degenerate smoother disabling smoothing: val=0, grad=0, hess=eps."""

    mu: jax.Array = 1.0
    Mh: float = static_field(default=0.0)
    nu: float = static_field(default=2.0)

    def val(self, x, cw=None):
        return jnp.zeros_like(x)

    def grad(self, x, cw=None):
        return jnp.zeros_like(x)

    def hess_diag(self, x, cw=None):
        return jnp.full_like(x, _eps(x.dtype))


# ---------------------------------------------------------------------------
# Pseudo-Huber family  (parity: phuber-smooth.jl; Mh=2.0, nu=2.6 at :3-4)
# ---------------------------------------------------------------------------

_PHUBER_MH = 2.0
_PHUBER_NU = 2.6


def phuber_val(x, mu):
    """sqrt(mu^2 + x^2) - mu.

    Algebraically identical to the reference's
    ``(mu^2 - mu*sqrt(mu^2+x^2) + x^2) / sqrt(mu^2+x^2)``
    (phuber-smooth.jl:29-31): with s = sqrt(mu²+x²), that is
    (s² − μs)/s = s − μ. The simplified form is one rsqrt cheaper and
    has no cancellation for |x| >> mu.
    """
    return jnp.sqrt(mu * mu + x * x) - mu


def phuber_grad(x, mu):
    """x / sqrt(mu^2 + x^2)  (phuber-smooth.jl:32-34)."""
    return x * jax.lax.rsqrt(mu * mu + x * x)


def phuber_hess(x, mu):
    """mu^2 * (mu^2 + x^2)^(-3/2)  (phuber-smooth.jl:35-37)."""
    s2 = mu * mu + x * x
    return mu * mu * jax.lax.rsqrt(s2) / s2


@pytree_dataclass
class PHuberSmootherL1L2(SmootherBase):
    """Pseudo-Huber smoothing of the l1/l2 regularizer (phuber-smooth.jl:6-37)."""

    mu: jax.Array
    Mh: float = static_field(default=_PHUBER_MH)
    nu: float = static_field(default=_PHUBER_NU)

    def val(self, x, cw=None):
        return phuber_val(x, self.mu)

    def grad(self, x, cw=None):
        return phuber_grad(x, self.mu)

    def hess_diag(self, x, cw=None):
        return phuber_hess(x, self.mu)


@pytree_dataclass
class PHuberSmootherIndBox(SmootherBase):
    """Pseudo-Huber smoothing of the box indicator (phuber-smooth.jl:38-114).

    Piecewise: pseudo-Huber of the distance to the violated bound outside
    [lb, ub]; an eps plateau inside (value/hess) and zero gradient inside.
    """

    lb: jax.Array
    ub: jax.Array
    mu: jax.Array
    Mh: float = static_field(default=_PHUBER_MH)
    nu: float = static_field(default=_PHUBER_NU)

    def val(self, x, cw=None):
        a, b = self.lb, self.ub
        below = phuber_val(a - x, self.mu)
        above = phuber_val(x - b, self.mu)
        inside = jnp.full_like(x, _eps(x.dtype))
        return jnp.where(x < a, below, jnp.where(x > b, above, inside))

    def grad(self, x, cw=None):
        a, b = self.lb, self.ub
        below = -phuber_grad(a - x, self.mu)  # d/dx phuber(a-x)
        above = phuber_grad(x - b, self.mu)
        return jnp.where(x < a, below, jnp.where(x > b, above, jnp.zeros_like(x)))

    def hess_diag(self, x, cw=None):
        a, b = self.lb, self.ub
        below = phuber_hess(a - x, self.mu)
        above = phuber_hess(x - b, self.mu)
        inside = jnp.full_like(x, _eps(x.dtype))
        return jnp.where(x <= a, below, jnp.where(x >= b, above, inside))


# ---------------------------------------------------------------------------
# Ostrovskii–Bach family (ostrovskii-bach-smooth.jl; Mh=2*sqrt(2), nu=3.0)
# ---------------------------------------------------------------------------

_OSBA_MH = 2.0 * np.sqrt(2.0)
_OSBA_NU = 3.0


def osba_val(x, mu, lam=1.0):
    """O&B smoothed |x| (ostrovskii-bach-smooth.jl:28-30), safe at x=0."""
    xs = jnp.where(x == 0, 1.0, x)  # guarded; result overridden at x==0
    s = jnp.sqrt(mu * mu + 4.0 * xs * xs)
    v = (
        s / 2.0
        - mu / 2.0
        + mu * jnp.log((2.0 * xs - s + mu) / xs) / 2.0
        - jnp.log(2.0) * mu
        + mu * jnp.log((s - mu + 2.0 * xs) / xs) / 2.0
    )
    return lam * jnp.where(x == 0, 0.0, v)


def osba_grad(x, mu, lam=1.0):
    """O&B gradient (ostrovskii-bach-smooth.jl:31-33), safe at x=0 (odd fn)."""
    xs = jnp.where(x == 0, 1.0, x)
    s = jnp.sqrt(mu * mu + 4.0 * xs * xs)
    num = (-(mu**3) + mu * mu * s - 4.0 * xs * xs * mu + 2.0 * xs * xs * s) * (
        mu * s + mu * mu + 4.0 * xs * xs
    )
    den = 4.0 * mu * mu * xs**3 + 16.0 * xs**5
    return lam * jnp.where(x == 0, 0.0, num / den)


def osba_hess(x, mu, lam=1.0):
    """O&B Hessian diagonal (ostrovskii-bach-smooth.jl:34-36).

    mu*(s - mu) / (2 x^2 s); the x→0 limit is 1/mu.
    """
    xs = jnp.where(x == 0, 1.0, x)
    s = jnp.sqrt(mu * mu + 4.0 * xs * xs)
    h = (s - mu) * mu / (xs * xs) / s / 2.0
    return lam * jnp.where(x == 0, 1.0 / mu, h)


@pytree_dataclass
class OsBaSmootherL1L2(SmootherBase):
    """Ostrovskii & Bach smoothing of l1/l2 (ostrovskii-bach-smooth.jl:6-36)."""

    mu: jax.Array
    Mh: float = static_field(default=_OSBA_MH)
    nu: float = static_field(default=_OSBA_NU)

    def val(self, x, cw=None):
        return osba_val(x, self.mu)

    def grad(self, x, cw=None):
        return osba_grad(x, self.mu)

    def hess_diag(self, x, cw=None):
        return osba_hess(x, self.mu)


# ---------------------------------------------------------------------------
# Exponential smoother for box indicator (exponential-smooth.jl; Mh=1, nu=2)
# ---------------------------------------------------------------------------


@pytree_dataclass
class ExponentialSmootherIndBox(SmootherBase):
    """One-sided exponential smoothing mu*exp((a - x)/mu).

    Only the lower bound enters (exponential-smooth.jl:36-50) — reproduced.
    """

    lb: jax.Array
    ub: jax.Array
    mu: jax.Array
    Mh: float = static_field(default=1.0)
    nu: float = static_field(default=2.0)

    def val(self, x, cw=None):
        return jnp.exp((self.lb - x) / self.mu) * self.mu

    def grad(self, x, cw=None):
        return -jnp.exp((self.lb - x) / self.mu)

    def hess_diag(self, x, cw=None):
        return jnp.exp((self.lb - x) / self.mu) / self.mu


# ---------------------------------------------------------------------------
# Log-exp smoother for box indicator (log-exp-smooth.jl; Mh=1, nu=2)
# ---------------------------------------------------------------------------


@pytree_dataclass
class LogExpSmootherIndBox(SmootherBase):
    """Two-sided quadratic-near-boundary + log-barrier-outside smoothing.

    Parity: log-exp-smooth.jl:36-61 (with the val/hess fixes documented in
    the module docstring).
    """

    lb: jax.Array
    ub: jax.Array
    mu: jax.Array
    Mh: float = static_field(default=1.0)
    nu: float = static_field(default=2.0)

    def val(self, x, cw=None):
        a, b, mu = self.lb, self.ub, self.mu
        quad = jnp.where(
            x <= a + mu,
            (a - x + 3.0 * mu) * (a - x + mu) / (2.0 * mu),
            jnp.where(
                x >= b - mu,
                (x - b + 3.0 * mu) * (x - b + mu) / (2.0 * mu),
                0.0,
            ),
        )
        dist_a = jnp.where(x < a, a - x, 1.0)
        dist_b = jnp.where(x > b, x - b, 1.0)
        barrier = jnp.where(
            x < a,
            mu * (jnp.log(mu) - jnp.log(dist_a)),
            jnp.where(x > b, mu * (jnp.log(mu) - jnp.log(dist_b)), 0.0),
        )
        return quad + barrier

    def grad(self, x, cw=None):
        a, b, mu = self.lb, self.ub, self.mu
        quad = jnp.where(
            x <= a + mu,
            (x - a - 2.0 * mu) / mu,
            jnp.where(x >= b - mu, (x - b + 2.0 * mu) / mu, 0.0),
        )
        da = jnp.where(x < a, a - x, 1.0)
        db = jnp.where(x > b, b - x, -1.0)
        barrier = jnp.where(
            x < a, mu / da, jnp.where(x > b, -mu / db, 0.0)
        )
        return quad + barrier

    def hess_diag(self, x, cw=None):
        a, b, mu = self.lb, self.ub, self.mu
        quad = jnp.where(
            x <= a + mu,
            1.0 / mu,
            jnp.where(x >= b - mu, 1.0 / mu, 0.0),
        )
        da = jnp.where(x < a, a - x, 1.0)
        db = jnp.where(x > b, b - x, 1.0)
        barrier = jnp.where(
            x < a, mu / (da * da), jnp.where(x > b, mu / (db * db), 0.0)
        )
        h = quad + barrier
        # Floor at machine eps: strictly inside both margins the reference
        # returns exactly 0 (log-exp-smooth.jl:57-61), whose inverse metric
        # is inf and NaN-poisons the step damping.
        return jnp.maximum(h, _eps(x.dtype))


# ---------------------------------------------------------------------------
# Group-lasso chain-rule smoothers (phuber-smooth.jl:116-190,
# ostrovskii-bach-smooth.jl:38-111)
# ---------------------------------------------------------------------------


def _gl_grad(base_val, base_grad, x, cw):
    """grad of h(Cmat·h(x)) chain: h'(cw*h(x)) .* h'(x).

    Parity: huber_l2l1_grad (phuber-smooth.jl:150-155) /
    osba_l2l1_grad (ostrovskii-bach-smooth.jl:73-78) with Cmat = diag(cw).
    """
    g1 = base_val(x)
    dg1 = base_grad(x)
    z = g1 if cw is None else cw * g1
    return base_grad(z) * dg1


def _gl_hess(base_val, base_grad, base_hess, x, cw):
    """Hessian diagonal of the chained smoother.

    Parity: huber_l2l1_hess (phuber-smooth.jl:156-164): note the scalar
    dot(Dg, Dg) factor is reproduced exactly.
    """
    g1 = base_val(x)
    dg1 = base_grad(x)
    ddg1 = base_hess(x)
    z = g1 if cw is None else cw * g1
    return base_hess(z) * jnp.dot(dg1, dg1) + base_grad(z) * ddg1


def _infconv_huber(groups: Groups, x, lam, mu):
    """Elementwise inf-convolution value (phuber-smooth.jl:166-183).

    Per group g with weight w: z_k = x_k * max(1 - lam*w/‖x_g‖, 0),
    then pseudo_huber(z_k; mu).
    """
    nrm = spread(groups, group_norms(groups, x))
    lw = lam * groups.element_weights
    safe_nrm = jnp.where(nrm == 0, 1.0, nrm)
    shrink = jnp.where(nrm == 0, 0.0, jnp.maximum(1.0 - lw / safe_nrm, 0.0))
    return phuber_val(x * shrink, mu)


def _infconv_osba(groups: Groups, x, lam, mu):
    """Elementwise O&B inf-convolution (ostrovskii-bach-smooth.jl:89-105):
    osba(x_k; mu, lam*w_g) — no group-norm shrinkage in the reference."""
    lw = lam * groups.element_weights
    return osba_val(x, mu, lam=lw)


@pytree_dataclass
class PHuberSmootherGL(SmootherBase):
    """Pseudo-Huber smoothing for the sparse group-lasso regularizer.

    Construct with ``PHuberSmootherGL(mu, problem)`` (mirrors
    phuber-smooth.jl:128-137) or directly with groups/lam1/lam2.
    """

    mu: jax.Array
    lam1: jax.Array = 0.0
    lam2: jax.Array = 0.0
    groups: Optional[Groups] = None
    Mh: float = static_field(default=_PHUBER_MH)
    nu: float = static_field(default=_PHUBER_NU)

    def val(self, x, cw=None):
        if self.groups is None:
            raise ValueError("PHuberSmootherGL.val requires group structure")
        u = _infconv_huber(self.groups, x, self.lam1, self.mu)
        return _infconv_huber(self.groups, u, self.lam2, self.mu)

    def grad(self, x, cw=None):
        return _gl_grad(
            lambda v: phuber_val(v, self.mu),
            lambda v: phuber_grad(v, self.mu),
            x,
            cw,
        )

    def hess_diag(self, x, cw=None):
        return _gl_hess(
            lambda v: phuber_val(v, self.mu),
            lambda v: phuber_grad(v, self.mu),
            lambda v: phuber_hess(v, self.mu),
            x,
            cw,
        )


@pytree_dataclass
class OsBaSmootherGL(SmootherBase):
    """Ostrovskii & Bach smoothing for the sparse group-lasso regularizer.

    Parity: OsBaSmootherGL (ostrovskii-bach-smooth.jl:38-70).
    """

    mu: jax.Array
    lam1: jax.Array = 0.0
    lam2: jax.Array = 0.0
    groups: Optional[Groups] = None
    Mh: float = static_field(default=_OSBA_MH)
    nu: float = static_field(default=_OSBA_NU)

    def val(self, x, cw=None):
        if self.groups is None:
            raise ValueError("OsBaSmootherGL.val requires group structure")
        u = _infconv_osba(self.groups, x, self.lam1, self.mu)
        return _infconv_osba(self.groups, u, self.lam2, self.mu)

    def grad(self, x, cw=None):
        return _gl_grad(
            lambda v: osba_val(v, self.mu),
            lambda v: osba_grad(v, self.mu),
            x,
            cw,
        )

    def hess_diag(self, x, cw=None):
        return _gl_hess(
            lambda v: osba_val(v, self.mu),
            lambda v: osba_grad(v, self.mu),
            lambda v: osba_hess(v, self.mu),
            x,
            cw,
        )


def make_gl_smoother(cls, mu, problem):
    """Factory matching the reference call shape `PHuberSmootherGL(mu, model)`."""
    lam = jnp.atleast_1d(jnp.asarray(problem.lam))
    if lam.shape[0] < 2:
        raise ValueError(
            "group-lasso smoother requires lam = [lam1, lam2] on the problem"
        )
    if problem.groups is None:
        raise ValueError("problem must carry group structure (groups=...)")
    return cls(mu=mu, lam1=lam[0], lam2=lam[1], groups=problem.groups)
