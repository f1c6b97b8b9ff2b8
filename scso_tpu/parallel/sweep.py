"""Instance-parallel solves: vmapped λ/μ regularization paths and fleets.

The reference runs one scalar solve per configuration (its λ-path example
re-calls `iterate!` per λ, README.md:190-272). TPU-natively the entire
solver — the jitted `lax.while_loop` epoch loop included — is a pure
function of the problem pytree, so a regularization path is ONE `vmap`
over (λ, μ) leaves and a fleet of independent problems is one `vmap` over
stacked problem leaves; the batch axis is sharded over the mesh so
thousands of instances run as embarrassingly-parallel SPMD
(BASELINE.json config 5: "vmapped 4096-instance λ/μ sweep").

Every instance runs the full while_loop; under vmap the loop executes
until ALL instances converge, with converged instances masked (their
`done` flag freezes the carry). That is the static-shape price of fusing
the fleet into one XLA program — and it is what makes the sweep one
compile + one device dispatch instead of 4096.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scso_tpu.algorithms.iterate import Options, _solve_fused_impl
from scso_tpu.problems import Problem
from scso_tpu._src.struct import replace as dc_replace


@dataclasses.dataclass
class SweepResult:
    """Batched solve results: leading axis = instance."""

    x: Any           # (B, n) final iterates
    obj: Any         # (B,) final objective f + g
    fval: Any        # (B,) final data term f
    rel: Any         # (B,) final relative error vs x_star
    epochs: Any      # (B,) epochs taken
    pri_res_norm: Any  # (B,) final primal residual
    obj_hist: Any    # (B, cap) objective history (valid up to epochs[i]+1)
    n_rec: Any       # (B,) number of valid history records per instance

    @property
    def batch_size(self):
        return self.x.shape[0]


def _carry_to_result(carry) -> SweepResult:
    n_rec = np.asarray(carry.hist.n_rec)
    idx = np.maximum(n_rec - 1, 0)
    take = lambda h: np.take_along_axis(np.asarray(h), idx[:, None],
                                        axis=1)[:, 0]
    return SweepResult(
        x=np.asarray(carry.x),
        obj=take(carry.hist.obj),
        fval=take(carry.hist.fval),
        rel=take(carry.hist.rel),
        epochs=np.asarray(carry.k),
        pri_res_norm=np.asarray(carry.pri_res),
        obj_hist=np.asarray(carry.hist.obj),
        n_rec=n_rec,
    )


def _batch_sharding(mesh: Optional[Mesh], batch_axis: str):
    if mesh is None:
        return None
    return NamedSharding(mesh, P(batch_axis))


def _xla_kernels(method):
    """Force the XLA compute path under vmap (Pallas batching rules don't
    cover the sequential-grid accumulator kernels)."""
    return dataclasses.replace(method, kernels="xla")


def sweep(method, prob: Problem, reg_name: str, sm, *,
          lam_grid=None, mu_grid=None, opts: Options = None,
          mesh: Optional[Mesh] = None, batch_axis: str = "batch",
          rng_seed: int = 0) -> SweepResult:
    """Solve a (λ, μ) regularization path as one vmapped SPMD program.

    Args:
      method / prob / reg_name / sm / opts: as in
        :func:`scso_tpu.algorithms.iterate.solve` — `prob` and `sm` are the
        template instance.
      lam_grid: (B,) or (B, k) penalty values; None keeps `prob.lam`.
      mu_grid: (B,) smoothing values; None keeps `sm.mu`.
      mesh / batch_axis: shard the instance axis over this mesh axis.

    Returns a :class:`SweepResult` with leading axis B.
    """
    opts = opts or Options()
    method = _xla_kernels(method)
    if lam_grid is None and mu_grid is None:
        raise ValueError("provide lam_grid and/or mu_grid")
    B = None
    for g in (lam_grid, mu_grid):
        if g is not None:
            gB = jnp.asarray(g).shape[0]
            if B is not None and gB != B:
                raise ValueError("lam_grid and mu_grid batch sizes differ")
            B = gB
    dt = prob.x0.dtype
    lam_grid = (jnp.broadcast_to(prob.lam, (B,) + jnp.shape(prob.lam))
                if lam_grid is None else jnp.asarray(lam_grid, dt))
    mu_grid = (jnp.broadcast_to(sm.mu, (B,) + jnp.shape(sm.mu))
               if mu_grid is None else jnp.asarray(mu_grid, dt))

    sh = _batch_sharding(mesh, batch_axis)
    if sh is not None:
        lam_grid = jax.device_put(lam_grid, sh)
        mu_grid = jax.device_put(mu_grid, sh)

    # prob/sm enter through jit as ARGUMENTS (vmap in_axes=None), never as
    # captured constants — a closed-over data matrix would be baked into
    # the HLO and shipped to the compiler byte-for-byte
    def run_one(lam, mu, p, s):
        p = dc_replace(p, lam=lam)
        s = dc_replace(s, mu=mu)
        return _solve_fused_impl(method, p, reg_name, s, opts, (), rng_seed)

    fn = jax.jit(jax.vmap(run_one, in_axes=(0, 0, None, None)))
    carry = jax.block_until_ready(fn(lam_grid, mu_grid, prob, sm))
    return _carry_to_result(carry)


def stack_problems(probs) -> Problem:
    """Stack a list of same-structure Problems into one batched Problem.

    All static metadata (f, out_fn, ...) must be identical; array leaves
    are stacked on a new leading instance axis.
    """
    return jax.tree.map(lambda *ls: jnp.stack(ls), *probs)


def solve_fleet(method, probs: Problem, reg_name: str, sms, *,
                opts: Options = None, mesh: Optional[Mesh] = None,
                batch_axis: str = "batch", rng_seed: int = 0) -> SweepResult:
    """Solve a fleet of independent problems (batched leaves, axis 0).

    `probs` / `sms` are batched pytrees (build with :func:`stack_problems`
    or by constructing leaves with a leading instance axis). The batch
    axis is sharded over `mesh[batch_axis]` when given.
    """
    opts = opts or Options()
    method = _xla_kernels(method)
    if mesh is not None:
        sh = _batch_sharding(mesh, batch_axis)
        put = lambda a: (jax.device_put(a, sh) if hasattr(a, "ndim") and a.ndim >= 1
                         else a)
        probs = jax.tree.map(put, probs)
        sms = jax.tree.map(put, sms)

    def run_one(p, s):
        return _solve_fused_impl(method, p, reg_name, s, opts, (), rng_seed)

    fn = jax.jit(jax.vmap(run_one))
    carry = jax.block_until_ready(fn(probs, sms))
    return _carry_to_result(carry)
