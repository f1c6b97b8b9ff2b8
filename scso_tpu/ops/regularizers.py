"""True (nonsmooth) regularizer values g(x).

Parity: `get_reg` (/root/reference/src/regularizers/regularizers.jl:4-31).
Implemented as a pure function dispatching on a static `reg_name` string
("l1" | "l2" | "indbox" | "gl"), evaluated eagerly at trace time — the
dispatch vanishes under jit exactly like Julia's method specialization.
"""

from __future__ import annotations

import jax.numpy as jnp

from scso_tpu.ops.groups import Groups, lasso_fz

REG_NAMES = ("l1", "l2", "indbox", "gl")


def indbox_f(x, lb, ub):
    """Box indicator: +inf if any coordinate violates [lb, ub], else 0.

    Parity: `indbox_f` (regularizers.jl:33-39).
    """
    violated = jnp.any(x < lb) | jnp.any(x > ub)
    return jnp.where(violated, jnp.inf, 0.0).astype(x.dtype)


def reg_value(reg_name: str, x, *, lam, lb=None, ub=None, groups: Groups = None):
    """g(x) for the given regularizer.

    - l1:     lam * Σ|x|                      (regularizers.jl:5-6)
    - l2:     lam * Σ x²                      (regularizers.jl:7-8)
    - indbox: 0 / +inf indicator of [lb, ub]  (regularizers.jl:9-19)
    - gl:     lam2 * Σ_g w_g‖x_g‖ + lam1 Σ|x| (regularizers.jl:20-27)

    ``lam`` is a scalar for l1/l2 and a length-2 vector [lam1, lam2] for gl.
    """
    if reg_name == "l1":
        return lam * jnp.sum(jnp.abs(x))
    if reg_name == "l2":
        return lam * jnp.sum(x * x)
    if reg_name == "indbox":
        if lb is None or ub is None:
            raise ValueError("indbox regularizer requires lb/ub (C_set)")
        return indbox_f(x, lb, ub)
    if reg_name == "gl":
        lam = jnp.atleast_1d(jnp.asarray(lam))
        if lam.shape[0] != 2:
            raise ValueError(
                "Please provide exactly two entries for lam, e.g. [lam1, lam2]"
            )
        if groups is None:
            raise ValueError("gl regularizer requires group structure")
        return lam[1] * lasso_fz(groups, x) + lam[0] * jnp.sum(jnp.abs(x))
    raise ValueError(f"reg_name {reg_name!r} not valid.")
