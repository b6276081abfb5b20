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
* Dense-mode caveat: the default dense (one-hot matmul) path lets a non-finite
  value in an in-range lane poison EVERY segment of an ND reduce via
  0 * inf = NaN, where scatter confines it to the lane's own segment.  Both
  modes make the cross-graph mean loss non-finite, so failure stays equally
  visible; for per-graph attribution under instability set
  ``EVI_SEGMENT_MODE=scatter`` (honored by computations traced after the
  change) or use the debug profile's ``jax_debug_nans``.

All functions operate on the leading axis of ``data``; trailing feature axes
are broadcast.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)

# EVI_SEGMENT_MODE: "dense" (default) | "scatter".
# Dense = one-hot [G, E] matmul/masked-reduce instead of XLA scatter for
# small segment counts (per-graph reductions, G <= EVI_SEGMENT_DENSE_MAX);
# larger counts (e.g. DDE per-node aggregation) always use scatter.  On a
# v5e chip dense measured +9-13% GFlowNet step (925 -> 1010 graphs/s
# uncached, 919 -> 1035 cached) and +11% retriever train step
# (1094 -> 1211 graphs/s): TPU scatter serializes updates while the
# membership matmul/masked-reduce stays on the MXU/VPU, and it vmaps
# (rollouts, shards) without batched-scatter penalties.


def _dense_ok(num_segments: int, op: str = "sum") -> bool:
    # Env is read at TRACE time (not import time) so flipping
    # EVI_SEGMENT_MODE mid-process affects every computation traced
    # afterwards; already-jitted computations keep their traced mode.
    if os.environ.get("EVI_SEGMENT_MODE", "dense") != "dense":
        return False
    if op not in os.environ.get("EVI_SEGMENT_DENSE_OPS", "sum,max,min").split(","):
        return False
    return num_segments <= int(os.environ.get("EVI_SEGMENT_DENSE_MAX", "128"))


def _onehot(segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """[G, E] bool membership matrix."""
    return segment_ids[None, :] == jnp.arange(
        num_segments, dtype=segment_ids.dtype
    )[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dense_sum(data, segment_ids, num_segments):
    oh = _onehot(segment_ids, num_segments)
    if data.ndim == 1:
        # where (not multiply): a non-finite value in a dropped lane must not
        # poison other segments via 0 * inf (scatter simply never adds it).
        sel = jnp.where(oh, data[None, :], jnp.zeros((), data.dtype))
        return sel.sum(axis=1)
    # ND: one-hot matmul (the MXU formulation).  Out-of-range lanes are
    # zeroed first -- they would otherwise contribute 0 * inf = NaN to every
    # segment if non-finite.  KNOWN DIVERGENCE from scatter: a non-finite
    # value in an *in-range* lane poisons every segment here (0 * inf = NaN
    # inside the matmul), where scatter confines it to the lane's own
    # segment.  Both paths make the cross-graph mean loss non-finite, so
    # training failure stays equally visible; per-graph metric attribution
    # under instability needs EVI_SEGMENT_MODE=scatter (or debug.yaml's
    # jax_debug_nans, which fires on the first non-finite value either way).
    in_range = (segment_ids >= 0) & (segment_ids < num_segments)
    flat = data.reshape(data.shape[0], -1)
    flat = jnp.where(in_range[:, None], flat, jnp.zeros((), flat.dtype))
    out = jnp.matmul(
        oh.astype(flat.dtype), flat, preferred_element_type=flat.dtype
    )
    return out.reshape((num_segments,) + data.shape[1:])


def _dense_sum_fwd(data, segment_ids, num_segments):
    return _dense_sum(data, segment_ids, num_segments), segment_ids


def _dense_sum_bwd(num_segments, segment_ids, cot):
    # Same VJP as the scatter path: gather the output cotangent at each
    # lane's segment.  The one-hot-multiply autodiff rule would instead
    # compute ``sum_g cot[g] * onehot[g, e]``, where a single +/-inf
    # cotangent poisons EVERY lane via 0 * inf = NaN.
    return jnp.take(cot, segment_ids, axis=0, mode="fill", fill_value=0), None


_dense_sum.defvjp(_dense_sum_fwd, _dense_sum_bwd)


def _dense_reduce(data, segment_ids, num_segments, fill, op):
    """1D masked min/max reduce via the [G, E] membership matrix."""
    oh = _onehot(segment_ids, num_segments)
    filled = jnp.where(oh, data[None, :], jnp.asarray(fill, data.dtype))
    return op(filled, axis=1)


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
    if _dense_ok(num_segments, "sum"):
        return _dense_sum(data, segment_ids, num_segments)
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
    if _dense_ok(num_segments, "max") and data.ndim == 1:
        return _dense_reduce(data, segment_ids, num_segments, fill, jnp.max)
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
    if _dense_ok(num_segments, "min") and data.ndim == 1:
        return _dense_reduce(data, segment_ids, num_segments, fill, jnp.min)
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
    # mode="fill" keeps out-of-range lanes finite (eager indexing would clamp,
    # jit would fill -- and a clamped NEG_INF max makes exp() overflow).
    shifted = data - jnp.take(seg_max, segment_ids, mode="fill", fill_value=0.0)
    if mask is not None:
        shifted = jnp.where(mask, shifted, -jnp.inf)
    expv = jnp.exp(shifted)
    seg_sum = segment_sum(expv, segment_ids, num_segments)
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
    shifted = data - jnp.take(seg_max, segment_ids, mode="fill", fill_value=0.0)
    if mask is not None:
        # Mask before exp (see segment_logsumexp): keeps gradients NaN-free.
        shifted = jnp.where(mask, shifted, -jnp.inf)
    expv = jnp.exp(shifted)
    denom = segment_sum(expv, segment_ids, num_segments)
    denom = jnp.maximum(denom, jnp.finfo(data.dtype).tiny)
    return expv / jnp.take(denom, segment_ids, mode="fill", fill_value=1.0)


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
    arg = segment_min(packed, segment_ids, num_segments)
    arg = jnp.where(arg >= n, 0, arg)
    return seg_max, arg
