"""General utilities: metrics, data slicing, checkpointing, profiling.

Parity layer for the reference's `src/utils/utils.jl` plus the auxiliary
subsystems the TPU build adds (SURVEY.md §5): solver-state
checkpoint/resume and `jax.profiler` phase tracing.
"""

from scso_tpu.utils.metrics import mean_square_error, slice_data, batch_iter
from scso_tpu.utils.deploy import (
    export_solver,
    load_solver,
    make_serving_fn,
)
from scso_tpu.utils.checkpoint import (
    load_state,
    load_state_orbax,
    save_state,
    save_state_orbax,
    solution_to_state,
)
from scso_tpu.utils.profiling import (
    PhaseTimer,
    device_memory_stats,
    profile_solve,
    profile_to,
    trace_phase,
)
from scso_tpu.utils.debug import sanitize, solve_with_recovery

__all__ = [
    "sanitize",
    "solve_with_recovery",
    "mean_square_error",
    "slice_data",
    "batch_iter",
    "save_state",
    "load_state",
    "save_state_orbax",
    "load_state_orbax",
    "solution_to_state",
    "export_solver",
    "load_solver",
    "make_serving_fn",
    "trace_phase",
    "profile_to",
    "PhaseTimer",
    "device_memory_stats",
    "profile_solve",
]
