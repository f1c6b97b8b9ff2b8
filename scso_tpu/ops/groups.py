"""Group structure for the (sparse-)group-lasso regularizer.

TPU-native replacement for the reference's sparse-matrix group machinery
(`get_P` and friends, /root/reference/src/utils/prox-reg-utils.jl:27-142).
Instead of a SparseMatrixCSC `Pmat`/`Cmat`, groups are described by a dense
integer `segment_ids` vector plus per-group weights; all group reductions
are `jax.ops.segment_sum` calls with a static number of segments — fixed
shapes, no gathers over sparse index structures, fully fusable by XLA.

The reference's `Cmat` (built by `get_Cmat`, prox-reg-utils.jl:121-142) is,
for the contiguous non-overlapping groups it supports, exactly
`diag(element_weights)` where `element_weights[i]` is the weight of element
`i`'s group.  We therefore represent its action as an elementwise multiply.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from scso_tpu._src.struct import pytree_dataclass, static_field


@pytree_dataclass
class Groups:
    """Static group structure over an ``n``-vector.

    Mirrors the information content of the reference `get_P` struct
    (prox-reg-utils.jl:9-24): group count, sizes, index ranges and weights.

    Attributes:
      segment_ids: int32[n] — group index of each element (0-based).
      weights: float[n_groups] — per-group weight (reference ``ind[3, :]``).
      element_weights: float[n] — ``weights[segment_ids]`` (the diagonal of
        the reference's ``Cmat``).
      n_groups: static int — number of groups (static for segment_sum).
      n: static int — total number of elements.
    """

    segment_ids: jax.Array
    weights: jax.Array
    element_weights: jax.Array
    n_groups: int = static_field()
    n: int = static_field()

    @property
    def sizes(self) -> jax.Array:
        """int[n_groups] — elements per group (reference ``grpSIZES``,
        prox-reg-utils.jl:12)."""
        return jax.ops.segment_sum(
            jnp.ones_like(self.segment_ids), self.segment_ids,
            num_segments=self.n_groups,
        )


def make_groups(segment_ids, weights=None, *, n_groups=None, dtype=None) -> Groups:
    """Build a :class:`Groups` from a segment-id vector.

    Args:
      segment_ids: int[n] group index per element (0-based, contiguous ids).
      weights: optional float[n_groups] group weights; default all-ones
        (the reference commonly uses weight 1 or sqrt(group size)).
      n_groups: static number of groups; inferred from segment_ids if None.
      dtype: weight dtype; defaults to the weights' own dtype (or the jnp
        default float type when weights is None).
    """
    segment_ids = np.asarray(segment_ids, dtype=np.int32)
    if n_groups is None:
        n_groups = int(segment_ids.max()) + 1 if segment_ids.size else 0
    if dtype is None:
        if weights is not None and np.asarray(weights).dtype.kind == "f":
            dtype = np.asarray(weights).dtype
        else:
            dtype = jnp.zeros((), jnp.float_).dtype
    if weights is None:
        weights = np.ones((n_groups,), dtype=dtype)
    weights = np.asarray(weights, dtype=dtype)
    element_weights = weights[segment_ids]
    return Groups(
        segment_ids=jnp.asarray(segment_ids),
        weights=jnp.asarray(weights),
        element_weights=jnp.asarray(element_weights),
        n_groups=n_groups,
        n=int(segment_ids.shape[0]),
    )


def make_groups_from_ind(n: int, ind, *, dtype=None) -> Groups:
    """Build Groups from the reference's 3×G ``ind`` matrix convention.

    ``ind`` rows are (group start, group end, group weight) with **1-based
    inclusive** indices, exactly the layout consumed by `get_P(n, G, ind)`
    (prox-reg-utils.jl:27-34). Groups must be contiguous, non-overlapping
    and cover 1..n — the same assumption baked into `get_Cmat`
    (prox-reg-utils.jl:121-142).
    """
    ind = np.asarray(ind)
    if ind.shape[0] != 3:
        raise ValueError("ind must be a 3 x n_groups matrix (start, end, weight)")
    starts = ind[0].astype(np.int64) - 1
    ends = ind[1].astype(np.int64)  # exclusive after -1+1
    weights = ind[2].astype(dtype if dtype is not None
                            else jnp.zeros((), jnp.float_).dtype)
    segment_ids = np.zeros((n,), dtype=np.int32)
    for g, (s, e) in enumerate(zip(starts, ends)):
        segment_ids[s:e] = g
    return make_groups(segment_ids, weights, n_groups=ind.shape[1], dtype=dtype)


def make_contiguous_groups(n: int, group_size: int, weights=None, dtype=None) -> Groups:
    """Equal-size contiguous groups covering 0..n-1 (n % group_size == 0 not required)."""
    segment_ids = np.arange(n) // group_size
    return make_groups(segment_ids, weights, dtype=dtype)


# ---------------------------------------------------------------------------
# Segment-reduction primitives (replace Pmat/Cmat sparse matvecs)
# ---------------------------------------------------------------------------


def group_sumsq(groups: Groups, z: jax.Array) -> jax.Array:
    """float[n_groups] — sum of squares of z within each group."""
    return jax.ops.segment_sum(
        z * z, groups.segment_ids, num_segments=groups.n_groups
    )


def group_norms(groups: Groups, z: jax.Array) -> jax.Array:
    """float[n_groups] — two-norm of z within each group.

    Parity: `twonorm` loops in prox-reg-utils.jl:112-119.
    """
    return jnp.sqrt(group_sumsq(groups, z))


def lasso_fz(groups: Groups, z: jax.Array) -> jax.Array:
    """Weighted sum of group norms: Σ_g w_g · ‖z_g‖₂.

    Parity: `fz` (prox-reg-utils.jl:101-110), the group-lasso value used by
    `get_reg(..., "gl")` (regularizers.jl:20-27).
    """
    return jnp.sum(groups.weights * group_norms(groups, z))


def spread(groups: Groups, per_group: jax.Array) -> jax.Array:
    """Broadcast a per-group vector back to per-element (gather)."""
    return per_group[groups.segment_ids]


def prox_l2_scaled(groups: Groups, x: jax.Array, lam: jax.Array, h: jax.Array) -> jax.Array:
    """Scaled group soft-scaling prox: x_k · max(1 − λ·w_g / (h_k·‖x_g‖), 0).

    Parity: `ProxL2` (prox-reg-utils.jl:84-99). `h` is the elementwise
    metric (the reference passes the inverse smoother-Hessian diagonal).
    """
    nrm = spread(groups, group_norms(groups, x))
    beta = lam * groups.element_weights
    denom = h * nrm
    scale = jnp.where(denom > 0, 1.0 - beta / jnp.where(denom == 0, 1.0, denom), 0.0)
    return x * jnp.maximum(scale, 0.0)


def proj_l2_scaled(groups: Groups, x: jax.Array, lam: jax.Array, h: jax.Array) -> jax.Array:
    """Scaled groupwise projection: x_k · min(λ·w_g / (h_k·‖(x/h)_g‖), 1).

    Parity: `ProjL2` (prox-reg-utils.jl:64-82).
    """
    nrm = spread(groups, group_norms(groups, x / h))
    beta = lam * groups.element_weights
    denom = h * nrm
    scale = jnp.where(denom > 0, beta / jnp.where(denom == 0, 1.0, denom), jnp.inf)
    return x * jnp.minimum(scale, 1.0)
