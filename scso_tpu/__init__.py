"""scso_tpu — TPU-native self-concordant-smoothing (SCORE) optimization.

A from-scratch JAX / XLA / Pallas framework for large-scale convex
composite optimization — minimize f(x) + g(x) with smooth convex f and
nonsmooth convex g — providing the full capability surface of
`SelfConcordantSmoothOptimization.jl` (the reference at /root/reference),
re-designed TPU-first:

  * pure-function pytree problems/smoothers/solvers inside a single
    jitted `lax.while_loop` (no per-iteration host round-trips);
  * matrix-free GGN-CG / Newton-CG on jvp/vjp Hessian-vector products
    for the large-n regime (replacing the reference's dense QR/\\ solves);
  * fixed-shape circular-buffer L-BFGS two-loop via `lax.scan`;
  * scale-out two ways on a `jax.sharding.Mesh`: row-sharded data
    matrices with psum-reduced gradients/HVPs, and vmapped fleets of
    independent solves for λ/μ regularization-path sweeps.

Public API mirrors the reference's surface
(src/SelfConcordantSmoothOptimization.jl:3-9): `Problem`, `iterate`,
the three methods, the smoother families, `get_reg`, `get_Mg`, prox
operators and the group-lasso structure utilities.
"""

from __future__ import annotations

import jax.numpy as jnp

from scso_tpu.problems import (
    GLMSpec,
    Interval,
    MOGLMSpec,
    Problem as CompositeProblem,
    ProblemLike,
    is_interval_set,
    make_problem,
    with_col_sumsq,
)
from scso_tpu.algorithms.methods import (
    ProxGGNSCORE,
    ProxLQNSCORE,
    ProxNSCORE,
    ProximalMethod,
)
from scso_tpu.algorithms.continuation import iterate_continuation
from scso_tpu.algorithms.iterate import Options, Solution, iterate, solve
from scso_tpu.algorithms.mixed import iterate_mixed, with_lp_copy
from scso_tpu.ops import smoothers as _smoothers
from scso_tpu.ops.groups import (
    Groups,
    lasso_fz,
    make_contiguous_groups,
    make_groups,
    make_groups_from_ind,
)
from scso_tpu.ops.prox import (
    prox_group_lasso,
    prox_indbox,
    prox_l1,
    prox_l2,
    prox_step,
)
from scso_tpu.ops.regularizers import indbox_f, reg_value
from scso_tpu.ops.smoothers import (
    NoSmooth,
    OsBaSmootherL1L2,
    PHuberSmootherL1L2,
    get_Mg,
    sanitize_bounds,
)
from scso_tpu.ops.linalg import armijo_linesearch, cg_solve, inv_bb_step

# Reference-parity constructor: `Problem(x0, f, lam; ...)` or
# `Problem(A, y, x0, f, lam; ...)` (problems.jl:44-81). The dataclass
# itself is available as `CompositeProblem` / `scso_tpu.problems.Problem`.
Problem = make_problem


def _bounded(cls, lb, ub, mu):
    a, b = sanitize_bounds(lb, ub)
    return cls(lb=jnp.asarray(a), ub=jnp.asarray(b), mu=mu)


def PHuberSmootherIndBox(lb, ub, mu):
    """Pseudo-Huber box-indicator smoother (phuber-smooth.jl:66-73)."""
    return _bounded(_smoothers.PHuberSmootherIndBox, lb, ub, mu)


def ExponentialSmootherIndBox(lb, ub, mu):
    """Exponential box-indicator smoother (exponential-smooth.jl:28-34)."""
    return _bounded(_smoothers.ExponentialSmootherIndBox, lb, ub, mu)


def LogExpSmootherIndBox(lb, ub, mu):
    """Log-exp box-indicator smoother (log-exp-smooth.jl:28-34)."""
    return _bounded(_smoothers.LogExpSmootherIndBox, lb, ub, mu)


def PHuberSmootherGL(mu, model):
    """Group-lasso pseudo-Huber smoother (phuber-smooth.jl:128-137)."""
    return _smoothers.make_gl_smoother(_smoothers.PHuberSmootherGL, mu, model)


def OsBaSmootherGL(mu, model):
    """Group-lasso Ostrovskii–Bach smoother (ostrovskii-bach-smooth.jl:60-69)."""
    return _smoothers.make_gl_smoother(_smoothers.OsBaSmootherGL, mu, model)


def get_reg(model, x, reg_name: str):
    """True nonsmooth g(x) — parity: get_reg (regularizers.jl:4-31)."""
    return model.reg(reg_name, x)


# `get_P` parity alias: the reference's group-structure constructor
# (prox-reg-utils.jl:27-62) — ours consumes the same 3×G `ind` matrix.
get_P = make_groups_from_ind

__version__ = "0.5.0"

__all__ = [
    "Problem",
    "CompositeProblem",
    "ProblemLike",
    "Interval",
    "GLMSpec",
    "MOGLMSpec",
    "is_interval_set",
    "make_problem",
    "with_col_sumsq",
    "iterate",
    "iterate_continuation",
    "iterate_mixed",
    "with_lp_copy",
    "solve",
    "Options",
    "Solution",
    "ProxNSCORE",
    "ProxGGNSCORE",
    "ProxLQNSCORE",
    "ProximalMethod",
    "NoSmooth",
    "PHuberSmootherL1L2",
    "PHuberSmootherIndBox",
    "PHuberSmootherGL",
    "OsBaSmootherL1L2",
    "OsBaSmootherGL",
    "ExponentialSmootherIndBox",
    "LogExpSmootherIndBox",
    "get_Mg",
    "get_reg",
    "get_P",
    "reg_value",
    "indbox_f",
    "prox_step",
    "prox_l1",
    "prox_l2",
    "prox_indbox",
    "prox_group_lasso",
    "Groups",
    "make_groups",
    "make_groups_from_ind",
    "make_contiguous_groups",
    "lasso_fz",
    "cg_solve",
    "inv_bb_step",
    "armijo_linesearch",
    "sanitize_bounds",
]
