"""Scale-out layer: device meshes, row-sharded data, instance sweeps.

New TPU-native capability — the reference has no parallelism of any kind
(SURVEY.md §2); see the module docstrings for the design.
"""

from scso_tpu.parallel.sharding import (
    distributed_init,
    make_mesh,
    pad_rows,
    replicate,
    shard_problem,
    shard_problem_features,
)
from scso_tpu.parallel.sweep import (
    SweepResult,
    solve_fleet,
    stack_problems,
    sweep,
)
from scso_tpu.parallel.federated import (
    FederatedResult,
    federated_solve,
    split_clients,
)
from scso_tpu.parallel.dataio import (
    load_problem_rows_sharded,
    load_rows_sharded,
    save_array,
    save_problem_data,
)

__all__ = [
    "distributed_init",
    "make_mesh",
    "pad_rows",
    "replicate",
    "shard_problem",
    "shard_problem_features",
    "SweepResult",
    "solve_fleet",
    "stack_problems",
    "sweep",
    "FederatedResult",
    "federated_solve",
    "split_clients",
    "load_problem_rows_sharded",
    "load_rows_sharded",
    "save_array",
    "save_problem_data",
]
