"""Retrieval metrics, fully device-side and jittable.

Re-designs the reference torchmetrics suite (``src/metrics/
retriever_metrics.py``, ``src/metrics/reachability.py``) for padded batches:

* Per-graph top-k membership is derived from an **in-graph rank** computed by
  one multi-key ``lax.sort`` over the whole padded edge axis (graph id
  primary, descending score secondary) -- no per-graph Python loops, unlike
  the reference's ``_iter_graph_edge_slices`` host iteration.
* ``AnswerReachability`` -- the model-selection metric
  (``configs/experiment/train_retriever.yaml:27-35``) -- replaces the
  reference's host union-find (``reachability.py:296-381``) with iterative
  min-label connected-component propagation with pointer-jumping shortcuts
  (O(log N) sweeps), vmapped over the k grid.  A start-set virtual merge is
  not needed: components are labeled, then components containing a start are
  marked and answers checked against the mark table.

Per-batch functions return per-graph values + validity masks; the host-side
``MetricAccumulator`` sums them across batches (and across processes via a
``psum`` when run under a mesh), replacing torchmetrics' ``dist_reduce_fx``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from evi_rag_tpu.models.batches import RetrieverBatch
from evi_rag_tpu.ops.segment import (
    segment_max,
    segment_min,
    segment_sum,
)

_COUNT_EPS = 1e-8


def normalize_k_values(k_values: Sequence[int] | None) -> tuple[int, ...]:
    """Sorted unique positive ints (reference ``utils/metrics.py:25-40``)."""
    if not k_values:
        return ()
    return tuple(sorted({int(k) for k in k_values if int(k) > 0}))


def edge_ranks_in_graph(
    scores: jax.Array,      # [E]
    edge_batch: jax.Array,  # [E]
    edge_ptr: jax.Array,    # [G+1]
    *,
    subset_mask: jax.Array | None = None,
) -> jax.Array:
    """0-based rank of each edge among its graph's edges, descending score.

    With ``subset_mask``, non-subset edges are pushed behind every subset edge
    so subset ranks are ranks *within the subset*.  One device sort; ties
    break toward lower edge index (stable).
    """
    e = scores.shape[0]
    s = scores.astype(jnp.float32)
    if subset_mask is not None:
        s = jnp.where(subset_mask, s, -jnp.inf)
    idx = jnp.arange(e, dtype=jnp.int32)
    # Sort by (graph, -score); stable in original index for ties.
    _, _, perm = jax.lax.sort(
        (edge_batch.astype(jnp.int32), -s, idx), num_keys=2, is_stable=True
    )
    sorted_graph = edge_batch[perm]
    pos = jnp.arange(e, dtype=jnp.int32)
    rank_sorted = pos - edge_ptr[sorted_graph].astype(jnp.int32)
    ranks = jnp.zeros(e, dtype=jnp.int32).at[perm].set(rank_sorted)
    return ranks


def edge_recall_at_k(
    scores: jax.Array,
    labels: jax.Array,
    batch: RetrieverBatch,
    k_values: Sequence[int],
    *,
    subset_mask: jax.Array | None = None,
    require_positive: bool = False,
) -> dict[str, jax.Array]:
    """Per-graph recall@k (+ ``graph_valid``): hits in top-k / #positives.

    ``subset_mask`` restricts both ranking and positives (bridge mode,
    reference ``BridgeEdgeRecallAtK``); ``require_positive`` drops graphs
    without (subset) positives from the count, matching the reference's
    bridge-metric semantics (``retriever_metrics.py:240-243``).
    """
    gb = batch.graph
    ks = normalize_k_values(k_values)
    emask = gb.edge_mask if subset_mask is None else (gb.edge_mask & subset_mask)
    ranks = edge_ranks_in_graph(scores, gb.edge_batch, gb.edge_ptr, subset_mask=emask)
    pos = (labels > 0.5) & emask
    pos_count = segment_sum(pos.astype(jnp.float32), gb.edge_batch, gb.num_graphs)
    edge_count = segment_sum(emask.astype(jnp.float32), gb.edge_batch, gb.num_graphs)
    out: dict[str, jax.Array] = {}
    for k in ks:
        in_topk = pos & (ranks < k)
        hits = segment_sum(in_topk.astype(jnp.float32), gb.edge_batch, gb.num_graphs)
        out[f"recall@{k}"] = hits / jnp.maximum(pos_count, _COUNT_EPS)
    # Graphs with no (subset) edges are skipped by the reference, not counted
    # as recall 0 (``retriever_metrics.py:125-131``: an empty edge slice is
    # ``continue``d before ``graph_count`` increments).
    valid = gb.graph_mask & (edge_count > 0)
    if require_positive:
        valid = valid & (pos_count > 0)
    out["graph_valid"] = valid
    return out


def score_margin(
    scores: jax.Array,
    labels: jax.Array,
    batch: RetrieverBatch,
) -> dict[str, jax.Array]:
    """min(pos score) - max(neg score) per graph (``ScoreMargin``,
    reference ``retriever_metrics.py:330-395``)."""
    gb = batch.graph
    pos = (labels > 0.5) & gb.edge_mask
    neg = (labels <= 0.5) & gb.edge_mask
    s = scores.astype(jnp.float32)
    min_pos = segment_min(s, gb.edge_batch, gb.num_graphs, mask=pos)
    max_neg = segment_max(s, gb.edge_batch, gb.num_graphs, mask=neg)
    has_pos = segment_sum(pos.astype(jnp.float32), gb.edge_batch, gb.num_graphs) > 0
    has_neg = segment_sum(neg.astype(jnp.float32), gb.edge_batch, gb.num_graphs) > 0
    valid = has_pos & has_neg & gb.graph_mask
    return {"margin": jnp.where(valid, min_pos - max_neg, 0.0), "graph_valid": valid}


def prob_quality(
    scores: jax.Array,
    labels: jax.Array,
    batch: RetrieverBatch,
    *,
    subset_mask: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Per-graph mean sigmoid prob for positives/negatives and separation
    (``BridgeProbQuality``, reference ``retriever_metrics.py:398-476``)."""
    gb = batch.graph
    emask = gb.edge_mask if subset_mask is None else (gb.edge_mask & subset_mask)
    pos = (labels > 0.5) & emask
    neg = (labels <= 0.5) & emask
    probs = jax.nn.sigmoid(scores.astype(jnp.float32))
    pos_n = segment_sum(pos.astype(jnp.float32), gb.edge_batch, gb.num_graphs)
    neg_n = segment_sum(neg.astype(jnp.float32), gb.edge_batch, gb.num_graphs)
    pos_mean = segment_sum(probs, gb.edge_batch, gb.num_graphs, mask=pos) / jnp.maximum(pos_n, 1.0)
    neg_mean = segment_sum(probs, gb.edge_batch, gb.num_graphs, mask=neg) / jnp.maximum(neg_n, 1.0)
    valid = (pos_n > 0) & (neg_n > 0) & gb.graph_mask
    return {
        "pos_prob": jnp.where(valid, pos_mean, 0.0),
        "neg_prob": jnp.where(valid, neg_mean, 0.0),
        "separation": jnp.where(valid, pos_mean - neg_mean, 0.0),
        "graph_valid": valid,
    }


def bridge_positive_coverage(
    labels: jax.Array,
    batch: RetrieverBatch,
) -> dict[str, jax.Array]:
    """Bridge-positive fractions (``BridgePositiveCoverage``,
    reference ``retriever_metrics.py:270-327``)."""
    gb = batch.graph
    bridge = ~batch.edge_is_near & gb.edge_mask
    pos = (labels > 0.5) & gb.edge_mask
    bridge_pos = pos & bridge
    pos_counts = segment_sum(pos.astype(jnp.float32), gb.edge_batch, gb.num_graphs)
    bpos_counts = segment_sum(bridge_pos.astype(jnp.float32), gb.edge_batch, gb.num_graphs)
    return {
        "bridge_pos_edges": jnp.sum(bpos_counts),
        "total_pos_edges": jnp.sum(pos_counts),
        "graphs_with_pos": jnp.sum((pos_counts > 0) & gb.graph_mask),
        "graphs_with_bridge_pos": jnp.sum((pos_counts > 0) & (bpos_counts > 0) & gb.graph_mask),
    }


def connected_component_labels(
    edge_index: jax.Array,   # [2, E]
    edge_in_subgraph: jax.Array,  # [E] bool
    num_nodes: int,
) -> jax.Array:
    """Min-label connected components over the masked edge set.

    Iterative min-exchange along edges + two pointer-jumping shortcuts per
    sweep; converges in O(log N) sweeps under ``lax.while_loop``.
    """
    heads, tails = edge_index[0], edge_index[1]
    init = jnp.arange(num_nodes, dtype=jnp.int32)
    big = jnp.int32(num_nodes)

    def sweep(labels: jax.Array) -> jax.Array:
        lh = labels[heads]
        lt = labels[tails]
        mn = jnp.where(edge_in_subgraph, jnp.minimum(lh, lt), big)
        upd_h = segment_min(mn, heads, num_nodes, fill=int(num_nodes))
        upd_t = segment_min(mn, tails, num_nodes, fill=int(num_nodes))
        labels = jnp.minimum(labels, jnp.minimum(upd_h, upd_t))
        labels = labels[labels]
        labels = labels[labels]
        return labels

    def cond(carry):
        labels, changed = carry
        return changed

    def body(carry):
        labels, _ = carry
        new = sweep(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return labels


def answer_reachability_at_k(
    scores: jax.Array,
    batch: RetrieverBatch,
    k_values: Sequence[int],
) -> dict[str, jax.Array]:
    """Per-graph bool: does the top-k edge set connect seeds to answers?

    The model-selection metric (reference ``AnswerReachability``,
    ``src/metrics/reachability.py:9-381``).  Components are recomputed per k
    (vmapped over the k grid); the reference instead streams edges through a
    host union-find -- equivalent results, device-resident here.
    """
    gb = batch.graph
    ks = normalize_k_values(k_values)
    if not ks:
        return {"graph_valid": gb.graph_mask}
    karr = jnp.asarray(ks, dtype=jnp.int32)

    # Compact to each graph's top-max(k) edges before the CC sweeps: edges
    # ranked past max(k) can never enter any k's subset, and at production
    # width they are ~95% of the padded edge axis (bucket E=65k vs
    # G*kmax=3.2k).  The CC label propagation is the eval step's dominant
    # cost (measured: phase/device_s = 99.7% of the at-scale eval stage),
    # and its per-sweep scatter work scales with the edge axis -- the same
    # stable (graph, -score) sort that defined ranks also lays each graph's
    # edges out rank-contiguously, so the top-kmax gather is one slice per
    # graph.  Results are bit-identical: same sort, same per-k subsets.
    e = gb.edge_mask.shape[0]
    kk = int(min(max(ks), e))
    s = jnp.where(gb.edge_mask, scores.astype(jnp.float32), -jnp.inf)
    idx = jnp.arange(e, dtype=jnp.int32)
    _, _, perm = jax.lax.sort(
        (gb.edge_batch.astype(jnp.int32), -s, idx), num_keys=2, is_stable=True
    )
    slot = jnp.arange(kk, dtype=jnp.int32)
    counts = (gb.edge_ptr[1:] - gb.edge_ptr[:-1]).astype(jnp.int32)  # [G]
    src_pos = jnp.minimum(
        gb.edge_ptr[:-1].astype(jnp.int32)[:, None] + slot[None, :], e - 1
    )  # [G, kk]
    sel_valid = slot[None, :] < jnp.minimum(counts, kk)[:, None]
    eidx = perm[src_pos]  # [G, kk] original edge ids, rank-ordered per graph
    sel_mask = (gb.edge_mask[eidx] & sel_valid).reshape(-1)
    sel_rank = jnp.broadcast_to(slot[None, :], src_pos.shape).reshape(-1)
    sel_edge_index = jnp.stack(
        [gb.edge_index[0][eidx].reshape(-1), gb.edge_index[1][eidx].reshape(-1)]
    )

    def reach_for_k(k: jax.Array) -> jax.Array:
        sub = sel_mask & (sel_rank < k)
        labels = connected_component_labels(sel_edge_index, sub, gb.num_nodes)
        # Mark component roots containing a start node.
        start_roots = jnp.where(batch.node_is_q, labels, gb.num_nodes)
        reached = jnp.zeros(gb.num_nodes + 1, dtype=bool).at[start_roots].set(True)[:-1]
        ans_reached = batch.node_is_a & reached[labels]
        hit = segment_max(
            ans_reached.astype(jnp.float32), gb.node_batch, gb.num_graphs
        )
        return hit > 0.5

    hits = jax.vmap(reach_for_k)(karr)  # [K, G]
    has_start = segment_sum(batch.node_is_q.astype(jnp.float32), gb.node_batch, gb.num_graphs) > 0
    has_answer = segment_sum(batch.node_is_a.astype(jnp.float32), gb.node_batch, gb.num_graphs) > 0
    # Edgeless graphs don't enter the reference denominator either
    # (``reachability.py:144-146``: num_edges <= 0 -> graph yields None).
    has_edges = segment_sum(gb.edge_mask.astype(jnp.float32), gb.edge_batch, gb.num_graphs) > 0
    valid = has_start & has_answer & has_edges & gb.graph_mask
    out = {f"reachability@{k}": hits[i] & valid for i, k in enumerate(ks)}
    out["graph_valid"] = valid
    return out


class MetricAccumulator:
    """Host-side streaming mean over per-graph metric values.

    Replaces torchmetrics state accumulation; under multi-process SPMD the
    sums are reduced with ``process_allgather`` by the eval driver.
    """

    def __init__(self) -> None:
        self._sums: dict[str, float] = {}
        self._counts: dict[str, float] = {}

    def update(self, values: dict[str, jax.Array], valid: jax.Array) -> None:
        valid_np = np.asarray(valid, dtype=bool)
        n = float(valid_np.sum())
        for name, v in values.items():
            if name == "graph_valid":
                continue
            v_np = np.asarray(v, dtype=np.float64)
            if v_np.ndim == 0:
                self._sums[name] = self._sums.get(name, 0.0) + float(v_np)
                self._counts[name] = self._counts.get(name, 0.0) + 1.0
            else:
                self._sums[name] = self._sums.get(name, 0.0) + float(v_np[valid_np].sum())
                self._counts[name] = self._counts.get(name, 0.0) + n

    def update_sums(self, values: dict[str, jax.Array]) -> None:
        """Accumulate raw sums (for ratio metrics computed at the end)."""
        for name, v in values.items():
            self._sums[name] = self._sums.get(name, 0.0) + float(np.asarray(v))
            self._counts[name] = 1.0

    def compute(self) -> dict[str, float]:
        return {
            k: self._sums[k] / max(self._counts.get(k, 1.0), _COUNT_EPS) for k in self._sums
        }

    def merge_from(self, other: "MetricAccumulator") -> None:
        for k, v in other._sums.items():
            self._sums[k] = self._sums.get(k, 0.0) + v
        for k, v in other._counts.items():
            self._counts[k] = self._counts.get(k, 0.0) + v
