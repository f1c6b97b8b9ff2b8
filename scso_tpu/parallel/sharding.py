"""Device-mesh sharding for SCORE solves.

The reference is single-threaded Julia with no distribution of any kind
(SURVEY.md §2 "Parallelism strategies" — verified absent across all 18
source files). Scale-out is therefore a new TPU-native design:

  * **data parallelism** — shard the data matrix A (and labels y) by ROWS
    over a mesh axis. Every f-side contraction (∇f = Aᵀ(...)/m, HVPs
    Aᵀ(w·(Av)), GGN matvecs Jᵀ(Q(Jv))) reduces over the row axis, so XLA
    lowers the partial sums to `psum` collectives over ICI automatically
    once A/y carry a row sharding and x is replicated. The solver core
    (scso_tpu.algorithms) is completely unchanged — this module only
    places data.
  * **instance parallelism** — vmap whole solves over λ/μ grids or
    problem fleets and shard the batch axis (see scso_tpu.parallel.sweep).

Typical meshes:
  * 1-D ``('data',)`` — pure row sharding, the 10⁷-row regime.
  * 2-D ``('batch', 'data')`` — a fleet of row-sharded solves.

This mirrors the scaling-book recipe: pick a mesh, annotate shardings
with `jax.device_put`/NamedSharding, let XLA insert collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scso_tpu.problems import Problem
from scso_tpu._src.struct import replace as dc_replace


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX (SURVEY.md §5 "Distributed communication").

    Call once per host before building meshes; with no arguments JAX
    auto-detects the TPU pod environment. Returns the global device
    count. After this, `make_mesh()` spans ALL hosts' devices and the
    psum collectives compile to ICI within a slice / DCN across slices.
    No-op when already initialized or single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # benign in a single-process environment ("already initialized" /
        # no cluster autodetected) — but NEVER hide the failure: a
        # multi-host launch that silently fell back to single-process
        # would shard over 1/N of the devices and psum nothing
        import warnings

        warnings.warn(
            f"jax.distributed.initialize did not complete ({e}); "
            "continuing single-process. If this is a multi-host launch, "
            "fix the coordinator/process arguments — the mesh below "
            "will only span this process's devices.",
            stacklevel=2)
    return len(jax.devices())


def make_mesh(shape=None, axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a `jax.sharding.Mesh`.

    Args:
      shape: mesh shape tuple; defaults to all devices on one axis.
      axis_names: one name per mesh dimension.
      devices: explicit device list (defaults to `jax.devices()`).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_arr, tuple(axis_names))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, sh) if hasattr(leaf, "shape") else leaf,
        tree,
    )


def shard_problem(prob: Problem, mesh: Mesh,
                  data_axis: str = "data") -> Problem:
    """Row-shard a data problem's (A, y[, Atest, ytest]) over `data_axis`.

    Everything else (x0, λ, bounds, groups, x*) is replicated. The solver
    then runs unchanged: inside `jit`, XLA partitions the matmuls by rows
    and inserts `psum` collectives for the Aᵀ(...) reductions over ICI.

    m must divide the axis size: zero-row padding would silently rescale
    1/m-normalized losses, so we refuse rather than guess — pad the data
    (and fix your loss normalization to divide by the original m)
    explicitly with :func:`pad_rows` first.
    """
    if not prob.has_data:
        raise ValueError("shard_problem requires a data problem (A, y)")
    axis_size = mesh.shape[data_axis]
    m = prob.A.shape[0]
    if m % axis_size != 0:
        raise ValueError(
            f"m={m} not divisible by {data_axis!r}={axis_size}: zero-row "
            "padding changes 1/m-normalized losses; pad the data (and its "
            "normalization) explicitly with scso_tpu.parallel.pad_rows")

    row_sh = NamedSharding(mesh, P(data_axis))
    rep = NamedSharding(mesh, P())

    def put_rows(a):
        if a is None:
            return None
        return jax.device_put(a, NamedSharding(
            mesh, P(data_axis, *([None] * (a.ndim - 1)))))

    def put_rep(a):
        return None if a is None else jax.device_put(a, rep)

    test_ok = (
        prob.Atest is not None
        and prob.Atest.shape[0] % axis_size == 0
    )
    return dc_replace(
        prob,
        A=put_rows(prob.A),
        y=put_rows(prob.y),
        Atest=put_rows(prob.Atest) if test_ok else put_rep(prob.Atest),
        ytest=put_rows(prob.ytest) if test_ok else put_rep(prob.ytest),
        x0=put_rep(prob.x0),
        lam=put_rep(prob.lam),
        L=put_rep(prob.L),
        x_star=put_rep(prob.x_star),
        lb=put_rep(prob.lb),
        ub=put_rep(prob.ub),
        groups=replicate(prob.groups, mesh),
        # precision-adaptive CG composes with row sharding (round 5):
        # the bf16 copy rides the same row sharding as A, and
        # steps._lp_matvec routes the CG curvature matvecs through the
        # shard_map'd fused kernel (or GSPMD-partitioned matmuls) —
        # every shard streams half the HBM bytes through the bulk phase
        A_lp=put_rows(prob.A_lp),
        mesh=mesh,
        data_axis=data_axis,
    )


def shard_problem_features(prob: Problem, mesh: Mesh,
                           model_axis: str = "model") -> Problem:
    """Column/feature-shard a data problem over `model_axis` (huge-n).

    The tensor-parallel analog for this problem class (SURVEY.md §2
    "Model/tensor parallel ... shard x if needed"): A's column axis and
    every n-vector (x0, x*, bounds, λ when vector) carry the same
    sharding, so under `jit`:
      * A·v contracts over the sharded axis → one psum, replicated (m,)
        result;
      * Aᵀ·u produces the (n,) result already sharded — no collective;
      * smoother/prox elementwise ops stay local; CG dot products psum.
    Composes with row sharding on a 2-D ('data', 'model') mesh: pass a
    problem already row-sharded on the same mesh.
    """
    if not prob.has_data:
        raise ValueError("shard_problem_features requires a data problem")
    axis_size = mesh.shape[model_axis]
    n = prob.x0.shape[-1]
    if n % axis_size != 0:
        raise ValueError(
            f"n={n} not divisible by {model_axis!r}={axis_size}")

    def col_spec(a):
        # preserve an existing row sharding on A if present
        if a is None:
            return None
        row = None
        sh = getattr(a, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.spec and sh.spec[0]:
            row = sh.spec[0]
        return jax.device_put(
            a, NamedSharding(mesh, P(row, model_axis)))

    vec = NamedSharding(mesh, P(model_axis))
    rep = NamedSharding(mesh, P())

    def put_vec(a):
        if a is None:
            return None
        if a.ndim >= 1 and a.shape[-1] == n:
            return jax.device_put(a, vec)
        return jax.device_put(a, rep)

    def put_rep(a):
        return None if a is None else jax.device_put(a, rep)

    return dc_replace(
        prob,
        A=col_spec(prob.A),
        Atest=col_spec(prob.Atest),
        y=put_rep(prob.y),
        ytest=put_rep(prob.ytest),
        x0=put_vec(prob.x0),
        x_star=put_vec(prob.x_star),
        lb=put_vec(prob.lb),
        ub=put_vec(prob.ub),
        lam=put_rep(prob.lam),
        L=put_rep(prob.L),
        # precision-adaptive CG is a single-chip feature: without this,
        # A_lp stays committed to one device while A is column-sharded,
        # and the lp gate (which keys on prob.mesh, unset here) would
        # route the hot matvec through a full-size single-device copy
        A_lp=None,
    )


def pad_rows(A, y, multiple: int):
    """Zero-pad (A, y) so the row count divides `multiple`.

    Returns (A_pad, y_pad, m_orig). Remember: losses normalized by the
    row count must keep dividing by m_orig, not the padded m.
    """
    import jax.numpy as jnp

    m = A.shape[0]
    pad = (-m) % multiple
    if pad == 0:
        return A, y, m
    A_pad = jnp.concatenate([A, jnp.zeros((pad,) + A.shape[1:], A.dtype)])
    y_pad = jnp.concatenate([y, jnp.zeros((pad,) + y.shape[1:], y.dtype)])
    return A_pad, y_pad, m
