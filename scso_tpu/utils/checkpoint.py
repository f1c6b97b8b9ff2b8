"""Checkpoint / resume for solver state.

The reference has no checkpointing (SURVEY.md §5 — a run just
re-executes). TPU-natively the entire solver state is a pytree of arrays
(iterate, histories, L-BFGS memory), so checkpointing is plain
serialization: `save_state` writes any pytree-of-arrays to one `.npz`
file, `load_state` restores it (optionally onto a template pytree for
structure/dtype fidelity). Resume a solve by passing the saved iterate
as the new problem's ``x0`` (warm start) — the SCORE methods are
memoryless across epochs except L-BFGS, whose (S, Y) memory is part of
the state and can be re-injected via `scso_tpu.ops.lbfgs_core`.
"""

from __future__ import annotations

import numpy as np
import jax


_SEP = "__leaf__"


def save_state(path: str, tree) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"{_SEP}{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state(path: str, template=None):
    """Load a pytree saved by :func:`save_state`.

    With ``template``, leaves are unflattened into the template's
    structure (and must match its leaf count); without, returns the flat
    list of arrays.
    """
    with np.load(path) as data:
        n = sum(1 for k in data.files if k.startswith(_SEP))
        leaves = [data[f"{_SEP}{i}"] for i in range(n)]
    if template is None:
        return leaves
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(t_leaves)}"
        )
    return jax.tree.unflatten(treedef, leaves)


def solution_to_state(sol) -> dict:
    """Extract the resumable state from a Solution."""
    return {
        "x": np.asarray(sol.x),
        "epochs": np.asarray(sol.epochs),
        "obj": np.asarray(sol.obj),
        "fval": np.asarray(sol.fval),
    }
