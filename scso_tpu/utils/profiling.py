"""Profiling / observability — the tracing subsystem (SURVEY.md §5).

The reference records only wall-clock deltas (`Dates.now()`,
iterate.jl:184-186). Here:

  * `trace_phase` / `profile_to` — `jax.profiler` named phases and
    one-call Perfetto trace capture;
  * `PhaseTimer` — host-side accumulating phase timers with correct
    device-completion semantics (`block=True` syncs before reading the
    clock; a jitted region that hasn't completed would otherwise bill
    its time to whoever blocks next);
  * `device_memory_stats` — per-device live/peak HBM usage;
  * `profile_solve` — run a solve in timed mode and return a structured
    breakdown (per-epoch wall times, step/stats split, CG iterations,
    device memory), optionally writing a Perfetto trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_phase(name: str):
    """Annotate a host-side phase in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a device trace (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating named wall-clock phases.

    >>> pt = PhaseTimer()
    >>> with pt.phase("grad"):
    ...     g = grad_fn(x)            # doctest: +SKIP
    >>> pt.totals()["grad"]           # doctest: +SKIP

    With ``block=True`` (default) the timer calls
    ``jax.block_until_ready`` on values registered via :meth:`sync`
    and ends each phase only after outstanding device work completes —
    async dispatch otherwise attributes device time to the next
    blocking phase.
    """

    def __init__(self, block: bool = True):
        self.block = block
        self._acc: dict = {}
        self._counts: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        if self.block and sync_value is not None:
            jax.block_until_ready(sync_value)
        dt = time.perf_counter() - t0
        self._acc[name] = self._acc.get(name, 0.0) + dt
        self._counts[name] = self._counts.get(name, 0) + 1

    def add(self, name: str, seconds: float):
        self._acc[name] = self._acc.get(name, 0.0) + seconds
        self._counts[name] = self._counts.get(name, 0) + 1

    def totals(self) -> dict:
        return dict(self._acc)

    def means(self) -> dict:
        return {k: v / self._counts[k] for k, v in self._acc.items()}

    def report(self) -> str:
        lines = ["phase                 total_s    calls   mean_ms"]
        for k in sorted(self._acc, key=self._acc.get, reverse=True):
            t, c = self._acc[k], self._counts[k]
            lines.append(f"{k:20s} {t:9.4f} {c:8d} {t/c*1e3:9.3f}")
        return "\n".join(lines)


def device_memory_stats(device=None) -> dict:
    """Live/peak HBM bytes for one device (empty dict if unsupported)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except (AttributeError, NotImplementedError):
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
            "largest_alloc_size")
    return {k: stats[k] for k in keep if k in stats}


def profile_solve(method, prob, reg_name: str, sm, *,
                  trace_dir: Optional[str] = None, **iterate_kwargs):
    """Run `iterate` in timed mode and return (solution, profile dict).

    The profile dict has per-epoch wall times (`epoch_times_s`), the
    total/step split, CG totals and before/after device memory. Pass
    ``trace_dir`` to also capture a Perfetto trace of the run.
    """
    from scso_tpu.algorithms.iterate import iterate

    iterate_kwargs.setdefault("verbose", 0)
    iterate_kwargs["mode"] = "timed"
    mem_before = device_memory_stats()
    ctx = profile_to(trace_dir) if trace_dir else contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        sol = iterate(method, prob, reg_name, sm, **iterate_kwargs)
    total = time.perf_counter() - t0
    times = list(map(float, sol.times))
    deltas = [b - a for a, b in zip(times, times[1:])]
    prof = {
        "total_s": total,
        "epochs": sol.epochs,
        "epoch_times_s": times,
        "epoch_deltas_s": deltas,
        "mean_epoch_s": (sum(deltas) / len(deltas)) if deltas else None,
        "total_cg_iters": (sol.cg_info or {}).get("total_cg_iters"),
        "memory_before": mem_before,
        "memory_after": device_memory_stats(),
        "trace_dir": trace_dir,
    }
    return sol, prof
