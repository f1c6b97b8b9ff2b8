"""Scaled (variable-metric) proximal operators.

Parity: /root/reference/src/prox/prox-operators.jl. The `h_scale` argument
is the INVERSE of the smoother Hessian diagonal (the algorithms pass
`Hdiag_inv = 1 ./ Hr_diag`, e.g. prox-N-SCORE.jl:93,106), which makes these
variable-metric prox steps: the effective threshold is
``t = alpha * lam / h_scale = alpha * lam * Hr_diag``.

All operators are branchless elementwise jnp expressions (VPU-friendly,
fusable); the group-lasso operator uses segment reductions.
"""

from __future__ import annotations

import jax.numpy as jnp

from scso_tpu.ops.groups import Groups, prox_l2_scaled


def prox_l1(x, h_scale, lam, alpha):
    """Scaled soft-thresholding: sign(x)·max(|x| − t, 0), t = α·λ/h.

    Parity: scaled_proximal_l1 (prox-operators.jl:1-12).
    """
    t = alpha * lam / h_scale
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


def prox_l2(x, h_scale, lam, alpha):
    """Scaled l2 shrinkage: x·max(1 − t/x², 0), t = α·λ/h.

    Parity: scaled_proximal_l2 (prox-operators.jl:14-25) — including its
    unusual 1 − t/x² form (rather than the Moreau 1/(1+2t) scaling), which
    we reproduce deliberately; see SURVEY.md §7.
    """
    t = alpha * lam / h_scale
    x2 = x * x
    safe = jnp.where(x2 == 0, 1.0, x2)
    scale = jnp.where(x2 == 0, 0.0, jnp.maximum(1.0 - t / safe, 0.0))
    return x * scale


def prox_indbox(x, lb, ub):
    """Clamp to the box [lb, ub] (metric-independent).

    Parity: scaled_proximal_indbox (prox-operators.jl:27-46).
    """
    return jnp.minimum(jnp.maximum(x, lb), ub)


def prox_group_lasso(x, h_scale, lam, alpha, groups: Groups):
    """Sparse-group-lasso prox: elementwise soft-threshold then group scaling.

    Parity: scaled_proximal_grouplasso (prox-operators.jl:48-66):
      u = SoftThreshold(x, lam1 / h)        # note: NO alpha factor, as in ref
      u = ProxL2(u, alpha*lam2, h)          # groupwise max(1 − β/(h‖u_g‖), 0)
    ``lam`` is [lam1, lam2].
    """
    lam = jnp.atleast_1d(jnp.asarray(lam))
    t = lam[0] / h_scale
    u = jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)
    return prox_l2_scaled(groups, u, alpha * lam[1], h_scale)


def prox_step(reg_name: str, x, h_scale, lam, alpha, *, lb=None, ub=None,
              groups: Groups = None):
    """Dispatch on static reg_name — parity: invoke_prox + prox_step
    (prox-operators.jl:68-80)."""
    if reg_name == "l1":
        return prox_l1(x, h_scale, lam, alpha)
    if reg_name == "l2":
        return prox_l2(x, h_scale, lam, alpha)
    if reg_name == "indbox":
        if lb is None or ub is None:
            raise ValueError("indbox prox requires lb/ub (C_set)")
        return prox_indbox(x, lb, ub)
    if reg_name == "gl":
        if groups is None:
            raise ValueError("gl prox requires group structure")
        return prox_group_lasso(x, h_scale, lam, alpha, groups)
    raise ValueError(f"reg_name {reg_name!r} not valid.")
