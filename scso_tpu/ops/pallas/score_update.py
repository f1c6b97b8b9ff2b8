"""Fused SCORE damped-prox update kernel.

Fuses the entire tail of every SCORE step (scso_tpu.algorithms.steps
`_damped_prox_update`, parity prox-N-SCORE.jl:92-118) into ONE kernel
launch over the parameter vector:

    eta   = sqrt( Σ lgr² / hr )            (reduction)
    alpha = ss / (1 + Mg·eta);  safe = min(1, alpha)
    xs    = x + safe·d
    x⁺    = prox_reg(xs; t = ss·λ·hr)      (elementwise, per reg kind)
    pri   = ‖x⁺ − x‖                       (reduction)

XLA would split this into separate reduction + elementwise kernels with
an HBM round-trip for xs; here the sequential TPU grid runs two phases
over the same blocks — phase 0 accumulates the η partial sums in SMEM,
phase 1 re-streams the blocks, applies the damped prox and accumulates
the primal residual — so each operand is read from HBM exactly twice and
nothing intermediate is materialized.

Supported reg kinds: 'l1', 'l2', 'indbox', 'none' (use_prox=False).
Group lasso needs segment reductions — callers fall back to the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scso_tpu.ops.pallas import counters

_LANES = 128
_BLOCK_ROWS = 64  # 64×128 = 8192 elements per block


def _make_kernel(reg: str, acc_dtype):
    def kernel(scal_ref, x_ref, d_ref, lgr_ref, hr_ref, lb_ref, ub_ref,
               xnew_ref, stats_ref, acc_ref):
        ph = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when((ph == 0) & (c == 0))
        def _():
            acc_ref[0] = jnp.zeros((), acc_dtype)   # eta² partial sum
            acc_ref[1] = jnp.zeros((), acc_dtype)   # pri² partial sum

        @pl.when(ph == 0)
        def _():
            lgr = lgr_ref[:].astype(acc_dtype)
            hr = hr_ref[:].astype(acc_dtype)
            # lgr²/hr → 0 when lgr = 0 even at hr = 0 (see steps.py η fix)
            acc_ref[0] += jnp.sum(jnp.where(lgr == 0, 0.0, lgr * lgr / hr))

        @pl.when(ph == 1)
        def _():
            lam = scal_ref[0]
            ss = scal_ref[1]
            Mg = scal_ref[2]
            eta = jnp.sqrt(acc_ref[0]).astype(x_ref.dtype)
            alpha = ss / (1.0 + Mg * eta)
            safe = jnp.minimum(jnp.asarray(1.0, x_ref.dtype), alpha)

            x = x_ref[:]
            xs = x + safe * d_ref[:]
            if reg == "l1":
                t = ss * lam * hr_ref[:]
                xn = jnp.sign(xs) * jnp.maximum(jnp.abs(xs) - t, 0.0)
            elif reg == "l2":
                t = ss * lam * hr_ref[:]
                xs2 = xs * xs
                sf = jnp.where(xs2 == 0, 1.0, xs2)
                scale = jnp.where(
                    xs2 == 0, 0.0, jnp.maximum(1.0 - t / sf, 0.0))
                xn = xs * scale
            elif reg == "indbox":
                xn = jnp.minimum(jnp.maximum(xs, lb_ref[:]), ub_ref[:])
            elif reg == "none":
                xn = xs
            else:  # pragma: no cover — guarded by the dispatcher
                raise ValueError(reg)
            xnew_ref[:] = xn
            dx = (xn - x).astype(acc_dtype)
            acc_ref[1] += jnp.sum(dx * dx)

            @pl.when(c == nc - 1)
            def _():
                stats_ref[0] = eta.astype(acc_dtype)
                stats_ref[1] = jnp.sqrt(acc_ref[1])
                stats_ref[2] = safe.astype(acc_dtype)

    return kernel


def _pad_to_blocks(v, rows, fill):
    n = v.shape[0]
    pad = rows * _LANES - n
    if pad:
        v = jnp.concatenate([v, jnp.full((pad,), fill, v.dtype)])
    return v.reshape(rows, _LANES)


@functools.partial(
    jax.jit, static_argnames=("reg", "interpret"))
def _fused_update(x, d, lgr, hr, lb, ub, lam, ss, Mg, reg, interpret):
    n = x.shape[0]
    dt = x.dtype
    rows = -(-n // _LANES)
    rows = -(-rows // 8) * 8  # sublane alignment
    br = min(_BLOCK_ROWS, rows)
    rows = -(-rows // br) * br
    nc = rows // br

    xb = _pad_to_blocks(x, rows, 0.0)
    db = _pad_to_blocks(d, rows, 0.0)
    lgrb = _pad_to_blocks(lgr, rows, 0.0)
    hrb = _pad_to_blocks(hr, rows, 1.0)
    zeros = jnp.zeros((n,), dt)
    lbb = _pad_to_blocks(jnp.broadcast_to(lb, (n,)).astype(dt)
                         if lb is not None else zeros, rows, 0.0)
    ubb = _pad_to_blocks(jnp.broadcast_to(ub, (n,)).astype(dt)
                         if ub is not None else zeros, rows, 0.0)

    acc_dtype = jnp.float64 if dt == jnp.float64 else jnp.float32
    scal = jnp.stack([jnp.asarray(lam, dt), jnp.asarray(ss, dt),
                      jnp.asarray(Mg, dt)])

    # Block index depends only on c so phase 0 streams EVERY block for the
    # eta² reduction (a `c * ph` map would pin all of phase 0 to block 0 and
    # sum block 0 nc times — wrong damping whenever nc > 1, i.e. n > 8192).
    blk = lambda: pl.BlockSpec((br, _LANES), lambda ph, c: (c, 0),
                               memory_space=pltpu.VMEM)
    xnew, stats = pl.pallas_call(
        _make_kernel(reg, acc_dtype),
        grid=(2, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            blk(), blk(), blk(), blk(), blk(), blk(),
        ],
        out_specs=(
            pl.BlockSpec((br, _LANES), lambda ph, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), dt),
            jax.ShapeDtypeStruct((3,), acc_dtype),
        ),
        scratch_shapes=[pltpu.SMEM((2,), acc_dtype)],
        interpret=interpret,
    )(scal, xb, db, lgrb, hrb, lbb, ubb)

    x_new = xnew.reshape(-1)[:n]
    eta = stats[0].astype(dt)
    pri = stats[1].astype(dt)
    safe = stats[2].astype(dt)
    return x_new, pri, eta, safe


def supports_fused_update(reg_name: str, use_prox: bool) -> bool:
    reg = reg_name if use_prox else "none"
    return reg in ("l1", "l2", "indbox", "none")


def fused_score_update(x, d, lgr, hr, lam, ss, Mg, reg_name: str,
                       use_prox: bool = True, lb=None, ub=None):
    """Damped prox update in one kernel; returns (x_new, pri, safe_alpha).

    Semantics identical to `_damped_prox_update` for scalar-λ reg kinds;
    callers must fall back for 'gl'.
    """
    reg = reg_name if use_prox else "none"
    if not supports_fused_update(reg_name, use_prox):
        raise ValueError(f"fused update does not support reg {reg_name!r}")
    counters.bump("fused_score_update")
    interpret = jax.default_backend() != "tpu"
    x_new, pri, _eta, safe = _fused_update(
        x, d, lgr, hr, lb, ub, lam, ss, Mg, reg, interpret)
    return x_new, pri, safe
