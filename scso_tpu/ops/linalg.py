"""Matrix-free linear algebra + step-size utilities.

- `cg_solve`: preconditioned conjugate gradients on an arbitrary SPD
  matvec closure — the TPU-native replacement for the reference's dense
  QR factorizations in the GGN step (prox-GGN-SCORE.jl:124-131) and the
  dense `\\` solve in the Newton step (prox-N-SCORE.jl:70). Runs as a
  bounded `lax.while_loop` with static max iterations; every iteration is
  one matvec (MXU) plus a handful of fused VPU axpys/dots. On a
  row-sharded mesh the matvec's partial sums psum over the data axis, so
  CG is the scalable multi-host path (BASELINE.json "GGN-CG" metric).

- `inv_bb_step`: the reference's "inverse Barzilai–Borwein" estimate
  (utils/utils.jl:43-48).

- `armijo_linesearch`: backtracking line search (utils/utils.jl:27-35),
  bounded for jit.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    res_norm_sq: jax.Array


def cg_solve(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array = None,
    *,
    tol: float = 1e-10,
    maxiter: int = 100,
    M_inv: Callable = None,
) -> CGResult:
    """Solve A x = b with (preconditioned) conjugate gradients.

    Args:
      matvec: closure v -> A @ v (A SPD; may contain psum collectives).
      b: right-hand side.
      x0: initial guess (zeros if None).
      tol: relative residual tolerance ‖r‖ ≤ tol·‖b‖.
      maxiter: static iteration cap.
      M_inv: optional preconditioner closure v -> M⁻¹ v (e.g. the inverse
        smoother-Hessian diagonal — a natural Jacobi preconditioner for
        the SCORE GGN system).
    """
    if M_inv is None:
        M_inv = lambda v: v

    dt = b.dtype
    b_norm_sq = jnp.vdot(b, b).real.astype(dt)
    atol_sq = (tol * tol) * b_norm_sq

    if x0 is None:
        # zero initial guess: r0 = b, no matvec spent
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        r0 = b - matvec(x0)
    z0 = M_inv(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0).real.astype(dt)

    def cond(state):
        _, r, _, _, rz, k = state
        return (jnp.vdot(r, r).real > atol_sq) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap).real.astype(dt)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(denom == 0, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = jnp.vdot(r, z).real.astype(dt)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        beta = jnp.where(rz == 0, 0.0, beta)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, jnp.int32(0)))
    return CGResult(x=x, iters=k, res_norm_sq=jnp.vdot(r, r).real)


def inv_bb_step(x, x_prev, grad_x, grad_x_prev):
    """Inverse Barzilai–Borwein step: L_est = (γ·γ)/(δ·γ).

    Parity: inv_BB_step (utils/utils.jl:43-48). The reference uses the
    returned L_est directly as the step size (prox-L-BFGS-SCORE.jl:118).
    """
    delta = x - x_prev
    gamma = grad_x - grad_x_prev
    denom = jnp.dot(delta, gamma)
    return jnp.dot(gamma, gamma) / jnp.where(denom == 0, 1.0, denom)


def armijo_linesearch(x, d, f: Callable, grad_f: Callable, *, rho=0.5, c=1e-4,
                      max_backtracks: int = 60):
    """Backtracking Armijo line search, bounded for jit.

    Parity: linesearch (utils/utils.jl:27-35) with ρ=0.5, c=1e-4 — the
    reference's while-loop is unbounded; we cap at `max_backtracks`
    halvings (2⁻⁶⁰ underflows anything representable anyway).
    """
    fx = f(x)
    slope = jnp.dot(grad_f(x), d)

    def cond(state):
        alpha, k = state
        return (f(x + alpha * d) > fx + c * alpha * slope) & (k < max_backtracks)

    def body(state):
        alpha, k = state
        return (rho * alpha, k + 1)

    alpha, _ = lax.while_loop(cond, body, (jnp.asarray(1.0, x.dtype), jnp.int32(0)))
    return alpha
