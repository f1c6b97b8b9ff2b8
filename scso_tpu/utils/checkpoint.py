"""Checkpoint / resume for solver state.

The reference has no checkpointing (SURVEY.md §5 — a run just
re-executes). TPU-natively the entire solver state is a pytree of arrays
(iterate, gradient caches, CG warm-start direction, L-BFGS (S, Y) memory,
history buffers, RNG key) — the `Carry` of the jitted `lax.while_loop`.
Every fused-mode :class:`~scso_tpu.algorithms.iterate.Solution` exposes it
as ``sol.state``; checkpointing is plain serialization and resume is
``iterate(..., resume_state=state)``, which re-injects the carry into the
while_loop and continues **bit-identically** to an uninterrupted run
(tested incl. ProxLQNSCORE memory and the batching RNG key).

`save_state` writes any pytree-of-arrays to one `.npz` file; `load_state`
restores it (optionally onto a template pytree for structure/dtype
fidelity, validating the stored treedef against the template's).
`save_state_orbax`/`load_state_orbax` are the same contract on the TPU
ecosystem's standard checkpoint format (orbax) — sharded multi-host
writes and async saves come with it.
"""

from __future__ import annotations

import os

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
    structure — the stored treedef string must match the template's
    (catches structure mismatches that happen to have equal leaf counts).
    Without, returns the flat list of arrays.
    """
    with np.load(path) as data:
        n = sum(1 for k in data.files if k.startswith(_SEP))
        leaves = [data[f"{_SEP}{i}"] for i in range(n)]
        stored_treedef = (
            bytes(data["__treedef__"]).decode()
            if "__treedef__" in data.files else None
        )
    if template is None:
        return leaves
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(t_leaves)}"
        )
    if stored_treedef is not None and stored_treedef != str(treedef):
        raise ValueError(
            "checkpoint treedef does not match template:\n"
            f"  stored:   {stored_treedef}\n"
            f"  template: {treedef}"
        )
    return jax.tree.unflatten(treedef, leaves)


def _pack_empty(a):
    """Orbax cannot serialize zero-size arrays (e.g. the metrics history
    with no metrics registered) — stand in a 1-element zero of the same
    dtype; load_state_orbax restores the true empty leaf from the
    template."""
    a = np.asarray(a)
    return np.zeros(1, a.dtype) if a.size == 0 else a


def save_state_orbax(path: str, tree, *, async_save: bool = False):
    """Serialize a pytree via orbax (the TPU-ecosystem checkpoint format).

    Same contract as :func:`save_state` but writes an orbax checkpoint
    DIRECTORY — on multi-host meshes each host writes only its shards,
    and ``async_save=True`` overlaps the write with ongoing compute:
    it returns the AsyncCheckpointer, which owns a background thread —
    call ``.wait_until_finished()`` before reading the checkpoint back
    and ``.close()`` when done (each unclosed checkpointer leaks its
    thread). Leaves are normalized to numpy arrays (orbax rejects bare
    numpy scalars).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tree = jax.tree.map(_pack_empty, tree)
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(path, tree, force=True)
        return ckptr
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    return None


def load_state_orbax(path: str, template=None):
    """Load an orbax checkpoint written by :func:`save_state_orbax`.

    With ``template``, the stored arrays are restored into the
    template's pytree structure (orbax validates names/shapes) and any
    zero-size template leaves come back as-is (their sentinel stand-ins
    — orbax cannot store empty arrays — are discarded). Without a
    template, returns a plain dict of the stored arrays, where
    originally-empty leaves appear as their 1-element sentinels.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        if template is None:
            return ckptr.restore(path)
        packed = jax.tree.map(_pack_empty, template)
        out = ckptr.restore(path, packed)
        return jax.tree.map(
            lambda t, r: np.asarray(t) if np.asarray(t).size == 0 else r,
            template, out)
    finally:
        ckptr.close()


def solution_to_state(sol):
    """Extract the resumable state from a Solution.

    Fused-mode solutions carry the full while_loop state (``sol.state``)
    — pass it to ``iterate(..., resume_state=...)`` for a bit-identical
    continuation. Solutions without one (timed mode) fall back to a
    summary dict usable as a warm start (``x0=state['x']``).
    """
    if getattr(sol, "state", None) is not None:
        return sol.state
    return {
        "x": np.asarray(sol.x),
        "epochs": np.asarray(sol.epochs),
        "obj": np.asarray(sol.obj),
        "fval": np.asarray(sol.fval),
    }
