"""Mixed-precision solving: bf16 data pass + f32 warm-started finish.

TPU matvecs at bench scale are HBM-bandwidth-bound, so storing the data
matrix in bfloat16 doubles effective matvec throughput (the MXU consumes
bf16 natively and accumulates f32). bf16's ~3 significant digits cap CG
direction accuracy around 1e-2–1e-3 relative, which caps the reachable
objective gap — so we run two phases:

  1. COARSE: solve with A cast to bf16 until `coarse_f_tol` (or its epoch
     budget runs out) — every A pass costs half the HBM traffic;
  2. FINE: restart from the coarse iterate with the original f32 data
     down to the target tolerance. Warm-starting means the expensive
     accurate phase runs only the last few Newton/GGN iterations.

This composes with everything else (Pallas kernels, sharding): both
phases are ordinary `iterate` calls on modified Problem pytrees.
No analogue exists in the reference (pure Float64 Julia) — this is
TPU-native capability per BASELINE.json's speed-of-light mandate.
"""

from __future__ import annotations

import jax.numpy as jnp

from scso_tpu.algorithms.iterate import Solution, iterate
from scso_tpu.problems import Problem
from scso_tpu._src.struct import replace as dc_replace


def with_lp_copy(model: Problem, dtype=jnp.bfloat16) -> Problem:
    """Attach a low-precision copy of the data matrix for
    precision-adaptive CG.

    Pair with ``ProxGGNSCORE(cg_lp_tol=...)``: epochs whose CG forcing
    tolerance is >= ``cg_lp_tol`` run their curvature matvecs on the
    ``dtype`` copy (bf16 = half the HBM traffic per CG iteration);
    tighter epochs use the full-precision A. Two regimes:
      * default f32 (tightening-only endgame forcing): set
        ``cg_lp_tol`` EQUAL to the CG floor (AUTO 3e-4) — bf16 through
        the whole bulk phase, f32 once the endgame tightens past it;
      * ``cg_adaptive=True`` (Eisenstat–Walker): a loose threshold like
         1e-2 — bf16 only while EW forcing is loose.
    Costs ``A.nbytes / 2`` extra HBM. Unlike `iterate_mixed`'s two-phase
    scheme the OUTER trajectory keeps full-precision gradients/RHS — only
    the inexact-Newton direction error grows, bounded by the forcing
    tolerance itself. For SCALAR solves: under vmap the per-epoch
    precision cond lowers to a select that runs both matvecs (see
    ProxGGNSCORE.cg_lp_tol).
    """
    if not model.has_data:
        raise ValueError("with_lp_copy requires a data problem (A, y)")
    return dc_replace(model, A_lp=model.A.astype(dtype))


def iterate_mixed(method, model: Problem, reg_name: str, h_mu, *,
                  coarse_f_tol: float = 1e-3, coarse_max_epoch: int = 50,
                  coarse_dtype=jnp.bfloat16, **kwargs) -> Solution:
    """Two-phase mixed-precision `iterate`.

    Accepts every `iterate` kwarg for the fine phase; the coarse phase
    runs with the data matrix (and test matrix) cast to ``coarse_dtype``
    and stops at ``coarse_f_tol`` relative objective gap. The returned
    Solution is the fine phase's (its histories cover the fine phase;
    ``times`` measures only the fine phase — add the coarse phase's for
    end-to-end wall clock).
    """
    if not model.has_data:
        # nothing bandwidth-bound to downcast — plain solve
        return iterate(method, model, reg_name, h_mu, **kwargs)

    cast = lambda a: None if a is None else a.astype(coarse_dtype)
    coarse_prob = dc_replace(model, A=cast(model.A), Atest=cast(model.Atest))
    coarse_kwargs = dict(kwargs)
    coarse_kwargs.update(f_tol=coarse_f_tol, max_epoch=coarse_max_epoch)
    coarse = iterate(method, coarse_prob, reg_name, h_mu, **coarse_kwargs)

    fine_prob = dc_replace(model, x0=jnp.asarray(coarse.x, model.x0.dtype))
    fine = iterate(method, fine_prob, reg_name, h_mu, **kwargs)
    # merge, don't overwrite: the fine solve's total_cg_iters must survive
    fine.cg_info = {
        **(fine.cg_info or {}),
        "coarse_epochs": coarse.epochs,
        "coarse_time_s": float(coarse.times[-1]) if len(coarse.times) else 0.0,
    }
    return fine
