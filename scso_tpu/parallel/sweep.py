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
import functools
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scso_tpu.algorithms.iterate import (
    Options,
    _solve_fused_impl,
    pad_history,
)
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


def _vmap_opts(opts: Options) -> Options:
    """Mark the solve as vmapped: the stats_every>1 inner loop must
    freeze finished instances with a where-mask, not lax.cond — the
    nested cond device-faults on TPU at large vmap widths (see
    Options.vmap_safe)."""
    return dataclasses.replace(opts, vmap_safe=True)


def _xla_kernels(method):
    """Force the XLA compute path under vmap.

    This IS the fast path for sweeps, not a fallback: with the data
    matrix shared across instances (``in_axes=None``), vmap batches every
    per-instance matvec ``A @ v`` into one MXU matmul ``A @ V`` — one A
    read amortized over the whole batch. The single-instance fused Pallas
    kernels exist to avoid a second A read within ONE instance; running
    them per-instance under the batch would re-read A per instance and be
    strictly worse. (Measured: the batched-matmul sweep saturates the MXU
    at config-5 scale; see docs/STATUS.md.)"""
    return dataclasses.replace(method, kernels="xla")


def _dispatch_latency_s() -> float:
    """Measured per-dispatch round-trip latency (seconds): best of three
    timed no-op dispatches of a pre-compiled trivial program. ~1 s over a
    tunneled TPU (axon), ~1 ms for local/ICI-attached devices, ~50 µs on
    CPU — the decisive input to the throughput-vs-quality plan rule."""
    import time

    f = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))  # compile outside the timing
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


#: rough device-class throughput constants for the plan='auto' estimate —
#: order-of-magnitude is all the rule needs (the two regimes it separates
#: differ by 100-1000x)
_PLAN_BW_BYTES_S = {"tpu": 500e9, "cpu": 20e9}
_PLAN_FLOPS_S = {"tpu": 4e13, "cpu": 2e11}
_PLAN_PASSES = 3        # data passes per epoch (step + stats, measured)
_PLAN_WARM_EPOCHS = 10  # measured mean warm-wave epochs (docs/STATUS.md)


def _largest_wave_count(B: int, cap: int = 16, ndev: int = 1) -> int:
    """Largest divisor of B in [2, cap] whose per-wave batch also divides
    the mesh's batch axis (0 if none — prime/tiny grids)."""
    for w in range(min(cap, B), 1, -1):
        if B % w == 0 and (B // w) % ndev == 0:
            return w
    return 0


def _resolve_plan(plan: str, prob: Problem, B: int, opts: Options,
                  ndev: int) -> tuple:
    """(path_waves, wave_max_epoch) for a named execution plan.

    Decision rule (from the round-2 measurements, docs/STATUS.md
    config-5): pathwise waves buy ~3.7x fewer epochs per instance but pay
    one dispatch per wave; they win wall-clock iff the per-wave compute
    dominates the dispatch latency. Estimate one warm wave's compute as
    WARM_EPOCHS x t_epoch with t_epoch = max(bandwidth term: PASSES x
    bytes(A) / BW — per-epoch A reads are batch-width-insensitive when
    the data is shared across instances — and compute term: PASSES x
    2 m n Bw / FLOPS), and take waves iff that exceeds 4x the measured
    dispatch latency (dispatch overhead < 25% per wave). Over the ~1 s
    axon tunnel with small per-instance work this picks 'throughput'
    (cold measured 3.84 s vs 15.7 s waves); on CPU or with ms-latency
    local chips and real per-instance work it picks 'quality' (CPU
    measured 64 total epochs vs 2994 cold for identical solutions).
    """
    if plan == "throughput":
        return 0, None
    W = _largest_wave_count(B, ndev=ndev)
    if W == 0:
        _plan_warn(f"plan={plan!r}: grid size {B} has no divisor in "
                   "[2, 16] — falling back to the cold one-dispatch plan")
        return 0, None
    cap = max(5, opts.max_epoch // 4)
    if plan == "quality":
        return W, cap
    # plan == 'auto'
    if prob.A is None:
        return 0, None  # data-less problems: per-epoch work unknown; cold
    m, n = prob.A.shape[0], prob.A.shape[-1]
    itemsize = jnp.dtype(prob.A.dtype).itemsize
    dev = "tpu" if jax.default_backend() == "tpu" else "cpu"
    Bw = B // W
    t_epoch = max(
        _PLAN_PASSES * m * n * itemsize / _PLAN_BW_BYTES_S[dev],
        _PLAN_PASSES * 2.0 * m * n * Bw / _PLAN_FLOPS_S[dev],
    )
    t_wave = _PLAN_WARM_EPOCHS * t_epoch
    if t_wave > 4.0 * _dispatch_latency_s():
        return W, cap
    return 0, None


_plan_warned: set = set()


def _plan_warn(msg):
    if msg not in _plan_warned:
        _plan_warned.add(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)


def sweep(method, prob: Problem, reg_name: str, sm, *,
          lam_grid=None, mu_grid=None, x0_grid=None, opts: Options = None,
          mesh: Optional[Mesh] = None, batch_axis: str = "batch",
          rng_seed: int = 0, path_waves: int = 0,
          wave_max_epoch: Optional[int] = None,
          plan: Optional[str] = None) -> SweepResult:
    """Solve a (λ, μ) regularization path as one vmapped SPMD program.

    Args:
      method / prob / reg_name / sm / opts: as in
        :func:`scso_tpu.algorithms.iterate.solve` — `prob` and `sm` are the
        template instance.
      lam_grid: (B,) or (B, k) penalty values; None keeps `prob.lam`.
      mu_grid: (B,) smoothing values; None keeps `sm.mu`.
      x0_grid: (B, n) per-instance initial iterates; None cold-starts
        every instance from ``prob.x0``. Composes the pathwise pattern
        by hand: e.g. polish a ``path_waves`` result with one wide
        dispatch via ``sweep(..., x0_grid=warm.x)``, or warm-start a
        fleet from a prior grid's solutions. Not combinable with
        ``path_waves`` (the waves manage their own starts).
      mesh / batch_axis: shard the instance axis over this mesh axis.
      path_waves: 0 (default) solves all B instances in one dispatch, each
        cold-started from ``prob.x0``. W ≥ 2 enables glmnet-style pathwise
        warm starting: the grid is sorted descending (by λ, or by μ when
        no lam_grid is given — smoothest problems first, homotopy from
        easy to sharp), split into W contiguous
        waves, and wave w's instances start from wave w−1's solutions —
        adjacent path points converge in a few epochs instead of re-paying
        the full cold-start cost per instance. All waves reuse ONE
        compiled program (identical shapes); results are returned in the
        original grid order. The reference's λ-path example re-solves
        cold per λ (README.md:190-272) — this is the TPU-native upgrade.
      wave_max_epoch: epoch cap for warm waves (wave 1 onward; wave 0 is
        cold and keeps ``opts.max_epoch``). Warm-started instances
        typically converge in a few epochs, but one straggler per wave
        forces the whole dispatch to the full cap — a small warm cap
        (e.g. a third of ``opts.max_epoch``) bounds that tail and cuts
        path wall time at the cost of leaving the hardest instances at
        the cap. Costs one extra compiled program (two instead of one).
        Only meaningful with ``path_waves >= 2``.
      plan: named execution plan — the measured-trade-aware alternative
        to hand-picking ``path_waves`` (mutually exclusive with it):

        * ``'throughput'`` — one wide cold dispatch (minimum wall-clock
          when per-dispatch latency dominates, e.g. a tunneled TPU:
          measured 3.84 s vs 15.7 s for 16 waves at config-5 scale).
        * ``'quality'`` — pathwise warm-started waves (W = largest
          divisor of B in [2,16], warm cap = max_epoch/4): ~3.7x fewer
          epochs per instance and better final objectives on ~92% of
          instances (docs/STATUS.md config-5), at W dispatches.
        * ``'auto'`` — picks between them by comparing one warm wave's
          estimated compute (bandwidth/FLOPs model of the template
          problem) against the MEASURED per-dispatch latency (3 timed
          no-op dispatches); waves must keep dispatch overhead < 25%.

        For the highest solution quality at throughput-plan wall-clock
        on high-latency links, compose waves with a final wide polish
        dispatch by hand: ``w = sweep(..., plan='quality')`` then
        ``sweep(..., x0_grid=w.x)``.

    Returns a :class:`SweepResult` with leading axis B.
    """
    opts = _vmap_opts(opts or Options())
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
    had_lam = lam_grid is not None
    # anchor both grids to the problem dtype as STRONG types: a Python-
    # float sm.mu would otherwise broadcast weak-f64 under x64, and any
    # later numpy round-trip (the path-wave sort) would strip the weak
    # tag and promote the whole solve to f64
    lam_grid = (jnp.broadcast_to(jnp.asarray(prob.lam, dt),
                                 (B,) + jnp.shape(prob.lam))
                if lam_grid is None else jnp.asarray(lam_grid, dt))
    mu_grid = (jnp.broadcast_to(jnp.asarray(sm.mu, dt),
                                (B,) + jnp.shape(sm.mu))
               if mu_grid is None else jnp.asarray(mu_grid, dt))

    if plan is not None:
        if plan not in ("throughput", "quality", "auto"):
            raise ValueError(
                f"plan={plan!r}: choose 'throughput' | 'quality' | 'auto'")
        if path_waves:
            raise ValueError("pass either plan= or path_waves=, not both")
        if wave_max_epoch is not None:
            raise ValueError("wave_max_epoch is chosen by the plan; pass "
                             "path_waves= to control it by hand")
        ndev = mesh.shape[batch_axis] if mesh is not None else 1
        path_waves, wave_max_epoch = _resolve_plan(plan, prob, B, opts,
                                                   ndev)

    if path_waves >= 2:
        if x0_grid is not None:
            raise ValueError("x0_grid cannot be combined with path_waves "
                             "(waves manage their own warm starts)")
        return _sweep_path(method, prob, reg_name, sm, opts, lam_grid,
                           mu_grid, had_lam, int(path_waves), mesh,
                           batch_axis, rng_seed, wave_max_epoch)
    if wave_max_epoch is not None:
        raise ValueError("wave_max_epoch requires path_waves >= 2")

    sh = _batch_sharding(mesh, batch_axis)
    if x0_grid is not None:
        x0_grid = jnp.asarray(x0_grid, dt)
        if x0_grid.shape != (B,) + prob.x0.shape:
            raise ValueError(
                f"x0_grid shape {x0_grid.shape} != {(B,) + prob.x0.shape}")
        # same guard as the wave path: with the degenerate default
        # x_star = 0 the f_tol gap test fires for any instance warm-
        # started at exactly 0 (e.g. a fully-sparsified wave solution),
        # freezing it at epoch 0 whether or not 0 is optimal at its λ
        if not np.any(np.asarray(jax.device_get(prob.x_star))):
            opts = dataclasses.replace(opts, f_tol=-1.0)
    if sh is not None:
        lam_grid = jax.device_put(lam_grid, sh)
        mu_grid = jax.device_put(mu_grid, sh)
        if x0_grid is not None:
            x0_grid = jax.device_put(x0_grid, sh)

    fn = _sweep_fn(method, reg_name, opts, rng_seed,
                   has_x0=x0_grid is not None)
    carry = jax.block_until_ready(fn(lam_grid, mu_grid, x0_grid, prob, sm))
    return _carry_to_result(carry)


@functools.lru_cache(maxsize=64)
def _sweep_fn(method, reg_name, opts, rng_seed, has_x0):
    """One jitted vmapped sweep program per static config (see
    _fleet_fn: a fresh jit per call recompiles; repeat callers — path
    waves, CV loops — reuse the cached wrapper).

    prob/sm enter through jit as ARGUMENTS (vmap in_axes=None), never as
    captured constants — a closed-over data matrix would be baked into
    the HLO and shipped to the compiler byte-for-byte.
    """

    def run_one(lam, mu, x0, p, s):
        p = (dc_replace(p, lam=lam, x0=x0) if has_x0
             else dc_replace(p, lam=lam))
        s = dc_replace(s, mu=mu)
        return _solve_fused_impl(method, p, reg_name, s, opts, (), rng_seed)

    x0_ax = 0 if has_x0 else None
    return jax.jit(jax.vmap(run_one, in_axes=(0, 0, x0_ax, None, None)))


def _sweep_path(method, prob, reg_name, sm, opts, lam_grid, mu_grid,
                sort_by_lam, W, mesh, batch_axis, rng_seed,
                wave_max_epoch=None):
    """Pathwise warm-started sweep: W sequential waves of B/W instances.

    Sorted by descending λ (most-regularized first — sparse, easy
    solutions), contiguous wave w warm-starts instance j from wave w−1's
    instance j, whose λ sits B/W grid positions earlier on the path. One
    jitted program serves every wave; the host loop only swaps traced
    leaves (λ, μ, x0), so there is exactly one compile and W dispatches.
    """
    B = lam_grid.shape[0]
    if B % W != 0:
        raise ValueError(f"path_waves={W} must divide the grid size {B}")
    Bw = B // W
    # With the degenerate default x_star = 0, obj_star = f(0) + g(0) and
    # the f_tol gap criterion declares ANY iterate at exactly 0
    # "converged" (raw_frel = 0). Cold starts never sit at 0, but a wave
    # warm-started from a fully-sparsified neighbor does — so the gap
    # test would fire spuriously at wave entry. Disable it for the wave
    # solves unless the user supplied a real x_star (x-stall and primal
    # residual criteria still stop each wave).
    if not np.any(np.asarray(jax.device_get(prob.x_star))):
        opts = dataclasses.replace(opts, f_tol=-1.0)
    key = np.asarray(lam_grid if sort_by_lam else mu_grid)
    if key.ndim > 1:  # multi-λ (e.g. gl [λ1, λ2]): order by total penalty
        key = key.reshape(key.shape[0], -1).sum(axis=1)
    # λ paths: descending (most-regularized/sparsest first — glmnet).
    # μ paths: descending too (smoothest problem first — homotopy from
    # easy to sharp).
    order = np.argsort(-key, kind="stable")
    lam_w = jnp.asarray(np.asarray(lam_grid)[order], lam_grid.dtype).reshape(
        (W, Bw) + lam_grid.shape[1:])
    mu_w = jnp.asarray(np.asarray(mu_grid)[order], mu_grid.dtype).reshape(
        (W, Bw) + mu_grid.shape[1:])

    sh = _batch_sharding(mesh, batch_axis)
    if sh is not None:
        ndev = mesh.shape[batch_axis]
        if Bw % ndev != 0:
            raise ValueError(
                f"per-wave batch {Bw} (= {B}/{W} waves) must be divisible "
                f"by mesh axis '{batch_axis}' size {ndev}; use fewer waves "
                "or a larger grid")
    put = (lambda a: jax.device_put(a, sh)) if sh is not None else (lambda a: a)

    make_fn = lambda o: _sweep_fn(method, reg_name, o, rng_seed,
                                  has_x0=True)

    fn = make_fn(opts)
    if wave_max_epoch is not None and int(wave_max_epoch) != opts.max_epoch:
        # warm waves run under a tighter epoch cap — a second compiled
        # program; their shorter history buffers are padded back to the
        # cold cap on the host before the final concatenate
        fn_warm = make_fn(
            dataclasses.replace(opts, max_epoch=int(wave_max_epoch)))
    else:
        fn_warm = fn

    x0_wave = put(jnp.broadcast_to(prob.x0, (Bw,) + prob.x0.shape))
    carries = []
    for w in range(W):
        carry = (fn if w == 0 else fn_warm)(
            put(lam_w[w]), put(mu_w[w]), x0_wave, prob, sm)
        carries.append(carry)
        x0_wave = carry.x
    jax.block_until_ready(carries[-1])

    cap = max(c.hist.obj.shape[-1] for c in carries)

    def _pad_hist(c):
        if c.hist.obj.shape[-1] == cap:
            return c
        return c._replace(hist=pad_history(c.hist, cap, xp=np))

    carries = [_pad_hist(c) for c in carries]
    stacked = jax.tree.map(lambda *ls: np.concatenate(
        [np.asarray(l) for l in ls], axis=0), *carries)
    inv = np.empty(B, dtype=np.int64)
    inv[order] = np.arange(B)
    unsort = jax.tree.map(lambda a: a[inv], stacked)
    return _carry_to_result(unsort)


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
    opts = _vmap_opts(opts or Options())
    method = _xla_kernels(method)
    if mesh is not None:
        sh = _batch_sharding(mesh, batch_axis)
        put = lambda a: (jax.device_put(a, sh) if hasattr(a, "ndim") and a.ndim >= 1
                         else a)
        probs = jax.tree.map(put, probs)
        sms = jax.tree.map(put, sms)

    fn = _fleet_fn(method, reg_name, opts, rng_seed)
    carry = jax.block_until_ready(fn(probs, sms))
    return _carry_to_result(carry)


@functools.lru_cache(maxsize=64)
def _fleet_fn(method, reg_name, opts, rng_seed):
    """One jitted vmapped fleet program per static config.

    A fresh ``jax.jit(jax.vmap(closure))`` per call would retrace and
    RECOMPILE every invocation (jit caches on the function object) —
    repeat callers like :func:`~scso_tpu.parallel.federated.
    federated_solve` invoke the identical program once per
    communication round, and TPU compiles go through a slow remote
    service. Statics (frozen method/opts dataclasses, reg_name, seed)
    are hashable, so memoize the wrapper itself.
    """

    def run_one(p, s):
        return _solve_fused_impl(method, p, reg_name, s, opts, (), rng_seed)

    return jax.jit(jax.vmap(run_one))
