"""Segment (per-graph grouped) reductions over flat padded element axes.

This module is the TPU-native replacement for the grouped-reduction surface the
reference obtains from torch_scatter / ATen scatter kernels: ``scatter_max``
(reference ``src/models/components/gflownet_actor.py:9,271``), ``scatter_min``
(``gflownet_rewards.py:9,212``), ``scatter_reduce_``/``index_add_`` segment
logsumexp and softmax (``src/losses/retriever_loss.py:100-124``,
``gflownet_policy.py:24-46``, ``gflownet_actor.py:21-41``).

Conventions
-----------
* ``num_segments`` is always static (a Python int) so everything is jittable
  with fixed shapes.
* Padding discipline: callers pass an optional boolean ``mask``; masked-out
  elements contribute the reduction identity (0 for sum, -inf for max/lse,
  +inf for min).  Empty segments yield the identity, never NaN -- matching the
  reference's -inf masking discipline in ``retriever_loss.py:98-118``.
* ``segment_argmax`` breaks ties toward the lowest element index,
  deterministically (torch_scatter's tie-break is unspecified; rollouts only
  hit ties on measure-zero events, so the fixed rule is behaviour-preserving).

All functions operate on the leading axis of ``data``; trailing feature axes
are broadcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _expand_mask(mask: jax.Array | None, data: jax.Array) -> jax.Array | None:
    if mask is None:
        return None
    mask = mask.astype(bool)
    while mask.ndim < data.ndim:
        mask = mask[..., None]
    return mask


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Per-segment sum; masked elements contribute 0."""
    m = _expand_mask(mask, data)
    if m is not None:
        data = jnp.where(m, data, jnp.zeros_like(data))
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Number of (valid) elements per segment."""
    ones = jnp.ones(segment_ids.shape, dtype=dtype)
    return segment_sum(ones, segment_ids, num_segments, mask=mask)


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    fill: float = NEG_INF,
) -> jax.Array:
    """Per-segment max; empty/masked segments return ``fill``."""
    m = _expand_mask(mask, data)
    if m is not None:
        data = jnp.where(m, data, jnp.full_like(data, fill))
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # segment_max fills empty segments with dtype-min already; clamp to `fill`.
    return jnp.maximum(out, jnp.asarray(fill, dtype=out.dtype))


def segment_min(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    fill: float | None = None,
) -> jax.Array:
    """Per-segment min; empty/masked segments return ``fill`` (dtype max by default)."""
    if fill is None:
        fill = float(jnp.finfo(jnp.float32).max) if jnp.issubdtype(data.dtype, jnp.floating) else int(jnp.iinfo(data.dtype).max)
    m = _expand_mask(mask, data)
    if m is not None:
        data = jnp.where(m, data, jnp.full_like(data, fill))
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.minimum(out, jnp.asarray(fill, dtype=out.dtype))


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Per-segment mean; empty segments return 0 (reference mean-aggregation
    semantics of ``PEConv`` -- torch_geometric fills isolated nodes with 0)."""
    total = segment_sum(data, segment_ids, num_segments, mask=mask)
    count = segment_count(segment_ids, num_segments, mask=mask, dtype=total.dtype)
    count = jnp.maximum(count, 1.0)
    while count.ndim < total.ndim:
        count = count[..., None]
    return total / count


def segment_logsumexp(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Numerically stable per-segment logsumexp over a 1D data axis.

    Empty/fully-masked segments return -inf-like ``NEG_INF`` (matching the
    reference's ``_segment_logsumexp_1d``, ``gflownet_actor.py:21-41``).
    """
    if data.ndim != 1:
        raise ValueError(f"segment_logsumexp expects 1D data, got shape {data.shape}")
    seg_max = segment_max(data, segment_ids, num_segments, mask=mask)
    # Mask BEFORE exp: a masked lane in a segment whose max is the NEG_INF
    # fill would otherwise compute exp(huge)=inf, and the downstream
    # where(mask, ., 0) would then produce 0*inf=NaN *gradients*.  With the
    # lane forced to -inf first, exp and its derivative are exactly 0.
    shifted = data - seg_max[segment_ids]
    if mask is not None:
        shifted = jnp.where(mask, shifted, -jnp.inf)
    expv = jnp.exp(shifted)
    seg_sum = jax.ops.segment_sum(expv, segment_ids, num_segments=num_segments)
    out = seg_max + jnp.log(jnp.maximum(seg_sum, jnp.finfo(data.dtype).tiny))
    return jnp.where(seg_sum > 0, out, jnp.full_like(out, NEG_INF))


def segment_softmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Per-segment softmax over a 1D data axis; masked lanes get probability 0.

    Replaces the reference ``_segment_softmax_1d`` (``gflownet_policy.py:24-46``).
    """
    if data.ndim != 1:
        raise ValueError(f"segment_softmax expects 1D data, got shape {data.shape}")
    seg_max = segment_max(data, segment_ids, num_segments, mask=mask)
    shifted = data - seg_max[segment_ids]
    if mask is not None:
        # Mask before exp (see segment_logsumexp): keeps gradients NaN-free.
        shifted = jnp.where(mask, shifted, -jnp.inf)
    expv = jnp.exp(shifted)
    denom = jax.ops.segment_sum(expv, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, jnp.finfo(data.dtype).tiny)
    return expv / denom[segment_ids]


def segment_argmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-segment (max, argmax) with deterministic lowest-index tie-break.

    Replaces torch_scatter ``scatter_max`` as used for Gumbel-max action
    selection (reference ``gflownet_actor.py:271``).  Empty segments return
    (``NEG_INF``, 0).
    """
    if data.ndim != 1:
        raise ValueError(f"segment_argmax expects 1D data, got shape {data.shape}")
    n = data.shape[0]
    seg_max = segment_max(data, segment_ids, num_segments, mask=mask)
    is_max = data == seg_max[segment_ids]
    if mask is not None:
        is_max = is_max & mask
    idx = jnp.arange(n, dtype=jnp.int32)
    packed = jnp.where(is_max, idx, n)  # n == "no candidate" sentinel
    arg = jax.ops.segment_min(packed, segment_ids, num_segments=num_segments)
    arg = jnp.where(arg >= n, 0, arg)
    return seg_max, arg
