"""Profiling helpers — the tracing subsystem (SURVEY.md §5).

The reference records only wall-clock deltas (`Dates.now()`,
iterate.jl:184-186). Here: `jax.profiler` named phases around the solver
stages and one-call Perfetto trace capture.
"""

from __future__ import annotations

import contextlib

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
