"""Deployment: AOT-export the fused solver as a StableHLO artifact.

Production serving wants a compiled, versioned artifact — not a Python
tracing pipeline. `export_solver` lowers the ENTIRE fused solve (the
`lax.while_loop` driver with the chosen method/regularizer/smoother
baked in as statics) to StableHLO via `jax.export` with an arrays-only
calling convention:

    serve(A, y, x0) -> (x_final, epochs, final_objective)

The artifact is self-contained: `load_solver` (or plain
`jax.export.deserialize` in any JAX process — scso_tpu need not be
installed) rebuilds a callable that executes without retracing, and the
serialization is stable across JAX versions per jax.export's
compatibility guarantees. Shapes/dtypes are static, the TPU-idiomatic
choice — export one artifact per served problem shape.

The reference has no deployment story (a Julia package: every run
re-JITs); this is additive TPU-native capability.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from scso_tpu.algorithms.iterate import Options, _solve_fused_impl
from scso_tpu.problems import Problem
from scso_tpu._src.struct import replace as dc_replace


def make_serving_fn(method, prob: Problem, reg_name: str, sm,
                    opts: Optional[Options] = None):
    """The arrays-only solve closure `(A, y, x0) -> (x, epochs, obj)`.

    Everything except the data triplet — method config, λ, bounds,
    group structure, smoother, tolerances — is baked in from the
    template problem. Useful directly (it is jit-compatible) and as the
    export surface.
    """
    if not prob.has_data:
        raise ValueError("export_solver requires a data problem (A, y)")
    opts = opts or Options(verbose=0)

    def serve(A, y, x0):
        p = dc_replace(prob, A=A, y=y, x0=x0)
        carry = _solve_fused_impl(method, p, reg_name, sm, opts, (), 0)
        n_rec = jnp.maximum(carry.hist.n_rec - 1, 0)
        final_obj = carry.hist.obj[..., n_rec]
        return carry.x, carry.k, final_obj

    return serve


def export_solver(method, prob: Problem, reg_name: str, sm,
                  opts: Optional[Options] = None) -> bytes:
    """Serialize the fused solve for `prob`'s shapes as StableHLO.

    Returns the `jax.export` blob; persist it wherever artifacts live.
    Rebuild with :func:`load_solver` (or `jax.export.deserialize` —
    no scso_tpu needed at serve time).
    """
    from jax import export as jax_export

    serve = make_serving_fn(method, prob, reg_name, sm, opts)
    args = (
        jax.ShapeDtypeStruct(prob.A.shape, prob.A.dtype),
        jax.ShapeDtypeStruct(prob.y.shape, prob.y.dtype),
        jax.ShapeDtypeStruct(prob.x0.shape, prob.x0.dtype),
    )
    exported = jax_export.export(jax.jit(serve))(*args)
    return bytes(exported.serialize())  # bytearray → immutable artifact


def load_solver(blob: bytes):
    """Deserialize an :func:`export_solver` artifact into a callable
    `(A, y, x0) -> (x, epochs, obj)` that executes without retracing."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return exported.call
