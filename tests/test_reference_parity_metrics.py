"""Differential parity of the L4 metric layer against torch oracles
transcribed line-by-line from the reference implementations.

Same pattern as ``tests/test_reference_parity.py`` (VERDICT r2 missing #1):
each oracle re-states the reference equations in plain torch/python, then the
JAX/numpy implementations are asserted equal on random inputs.  Covered here:

* ``EdgeRecallAtK``            <- ``src/metrics/retriever_metrics.py:83-166``
* ``BridgeEdgeRecallAtK``      <- ``retriever_metrics.py:169-267`` (+ the
  bridge mask, ``src/utils/graph_utils.py:107-153``)
* ``BridgePositiveCoverage``   <- ``retriever_metrics.py:270-327``
* ``ScoreMargin``              <- ``retriever_metrics.py:330-395``
* ``BridgeProbQuality``        <- ``retriever_metrics.py:398-476``
* ``AnswerReachability``       <- ``src/metrics/reachability.py:9-381``
  (incremental union-find over ranked edges -- the model-selection metric)
* ``compute_ranking_metrics`` / ``compute_answer_recall`` /
  ``compute_answer_hit``       <- ``src/utils/metrics.py:112-238``
* BFS shortest-path-union supervision (undirected + qa_directed)
                               <- ``scripts/build_retrieval_pipeline.py:610-830``

Scores are continuous random floats: torch.topk/argsort tie order is
unspecified, so exact-tie rank semantics are exercised elsewhere
(``test_metrics.py::test_edge_ranks``), not here.
"""

from __future__ import annotations

import dataclasses
from collections import deque

import jax
import numpy as np
import pytest
import torch

from evi_rag_tpu.data.bfs_label import shortest_path_union_by_pair
from evi_rag_tpu.data.feeder import Bucket, collate_retriever
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.eval.metrics import (
    MetricAccumulator,
    answer_reachability_at_k,
    bridge_positive_coverage,
    edge_recall_at_k,
    prob_quality,
    score_margin,
)
from evi_rag_tpu.eval.ranking import (
    compute_answer_hit,
    compute_answer_recall,
    compute_ranking_metrics,
)

K_GRID = [1, 3, 5, 10, 25]


# --------------------------------------------------------------------- #
# Shared fixture: a padded batch with per-graph views for the oracles,
# including a zero-positive graph and a zero-edge graph (the reference
# protocol's denominator edge cases).
# --------------------------------------------------------------------- #


@dataclasses.dataclass
class GraphView:
    """One graph's data as the reference metrics see it (unpadded)."""

    scores: torch.Tensor       # [e]
    labels: torch.Tensor       # [e] bool
    edge_index: torch.Tensor   # [2, e] graph-local
    num_nodes: int
    q_local: torch.Tensor
    a_local: torch.Tensor


@pytest.fixture(scope="module")
def batch_and_views():
    ds = make_synthetic_dataset(num_samples=10, emb_dim=16, max_nodes=24, seed=23)
    bucket = Bucket(graphs=11, nodes=320, edges=2560)
    batch = collate_retriever(
        ds.samples, entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    rng = np.random.default_rng(5)
    scores = rng.normal(size=batch.graph.num_edges).astype(np.float32)

    # Edge-case surgery: graph 3 loses all positives; graph 6 loses all its
    # edges (edge_mask False), exercising the reference's skip-vs-zero rules.
    # A random 20% of edges flip positive so bridge (non-q/a-incident) edges
    # carry positives too -- metric parity needs label variety, not
    # model-consistent labels.
    labels = np.asarray(batch.edge_labels).copy()
    eb = np.asarray(batch.graph.edge_batch)
    labels[rng.random(labels.shape) < 0.2] = 1.0
    labels[eb == 3] = 0.0
    emask = np.asarray(batch.graph.edge_mask).copy()
    emask[eb == 6] = False
    batch = dataclasses.replace(
        batch,
        graph=dataclasses.replace(batch.graph, edge_mask=jax.numpy.asarray(emask)),
        edge_labels=jax.numpy.asarray(labels),
    )

    node_ptr = np.asarray(batch.graph.node_ptr)
    nb = np.asarray(batch.graph.node_batch)
    heads = np.asarray(batch.graph.edge_index[0])
    tails = np.asarray(batch.graph.edge_index[1])
    is_q = np.asarray(batch.node_is_q)
    is_a = np.asarray(batch.node_is_a)
    gmask = np.asarray(batch.graph.graph_mask)

    views: list[GraphView] = []
    for g in range(batch.graph.num_graphs):
        if not gmask[g]:
            continue
        esel = np.nonzero((eb == g) & emask)[0]
        nsel = np.nonzero(nb == g)[0]
        base = int(node_ptr[g])
        views.append(GraphView(
            scores=torch.from_numpy(scores[esel].copy()),
            labels=torch.from_numpy(labels[esel] > 0.5),
            edge_index=torch.from_numpy(
                np.stack([heads[esel] - base, tails[esel] - base]).astype(np.int64)
            ),
            num_nodes=int(nsel.size),
            q_local=torch.from_numpy((np.nonzero(is_q[nsel])[0]).astype(np.int64)),
            a_local=torch.from_numpy((np.nonzero(is_a[nsel])[0]).astype(np.int64)),
        ))
    return batch, scores, views


def _oracle_bridge_mask(v: GraphView) -> torch.Tensor:
    """``compute_qa_edge_mask`` complement (graph_utils.py:107-153)."""
    node_mask = torch.zeros(v.num_nodes, dtype=torch.bool)
    qa = torch.cat([v.q_local, v.a_local])
    if qa.numel():
        node_mask[qa] = True
    near = node_mask[v.edge_index[0]] | node_mask[v.edge_index[1]]
    return ~near


def _oracle_recall_update(scores, labels, k_values, *, require_positive):
    """One graph's contribution to Edge/BridgeRecallAtK
    (retriever_metrics.py:134-158 / 234-258).  Returns None if skipped."""
    if scores.numel() == 0:
        return None
    pos_count = labels.sum().to(torch.float32)
    if require_positive and pos_count <= 0:
        return None
    max_k = max(k_values)
    k_top = min(int(scores.numel()), max_k)
    top_idx = torch.topk(scores, k=k_top, largest=True, sorted=True).indices
    cum_hits = torch.cumsum(labels[top_idx].to(torch.float32), dim=0)
    denom = pos_count.clamp(min=1.0)
    out = {}
    for k in k_values:
        k_eff = min(int(k), k_top)
        hits = cum_hits[k_eff - 1] if k_eff > 0 else torch.zeros(())
        out[k] = float(hits / denom)
    return out


def test_edge_recall_matches_torch_oracle(batch_and_views):
    batch, scores, views = batch_and_views
    res = jax.jit(lambda s: edge_recall_at_k(s, batch.edge_labels, batch, K_GRID))(scores)
    acc = MetricAccumulator()
    acc.update(res, res["graph_valid"])
    got = acc.compute()

    sums = {k: 0.0 for k in K_GRID}
    count = 0
    for v in views:
        upd = _oracle_recall_update(v.scores, v.labels, K_GRID, require_positive=False)
        if upd is None:
            continue
        count += 1
        for k in K_GRID:
            sums[k] += upd[k]
    assert count == len(views) - 1  # the zero-edge graph is skipped
    for k in K_GRID:
        np.testing.assert_allclose(got[f"recall@{k}"], sums[k] / count, rtol=1e-6)


def test_bridge_recall_matches_torch_oracle(batch_and_views):
    batch, scores, views = batch_and_views
    res = jax.jit(
        lambda s: edge_recall_at_k(
            s, batch.edge_labels, batch, K_GRID,
            subset_mask=~batch.edge_is_near, require_positive=True,
        )
    )(scores)
    acc = MetricAccumulator()
    acc.update(res, res["graph_valid"])
    got = acc.compute()

    sums = {k: 0.0 for k in K_GRID}
    count = 0
    for v in views:
        bridge = _oracle_bridge_mask(v)
        upd = _oracle_recall_update(
            v.scores[bridge], v.labels[bridge], K_GRID, require_positive=True
        )
        if upd is None:
            continue
        count += 1
        for k in K_GRID:
            sums[k] += upd[k]
    assert count > 0
    for k in K_GRID:
        np.testing.assert_allclose(got[f"recall@{k}"], sums[k] / count, rtol=1e-6)


def test_bridge_coverage_matches_torch_oracle(batch_and_views):
    batch, scores, views = batch_and_views
    got = jax.jit(lambda: bridge_positive_coverage(batch.edge_labels, batch))()

    bridge_pos = total_pos = with_pos = with_bridge_pos = 0.0
    for v in views:
        bridge = _oracle_bridge_mask(v)
        lab = v.labels.to(torch.float32)
        total_pos += float(lab.sum())
        bridge_pos += float(lab[bridge].sum())
        has_pos = bool(lab.sum() > 0)
        has_bridge_pos = bool(lab[bridge].sum() > 0)
        with_pos += float(has_pos)
        with_bridge_pos += float(has_pos and has_bridge_pos)

    np.testing.assert_allclose(float(got["bridge_pos_edges"]), bridge_pos, rtol=1e-6)
    np.testing.assert_allclose(float(got["total_pos_edges"]), total_pos, rtol=1e-6)
    np.testing.assert_allclose(float(got["graphs_with_pos"]), with_pos)
    np.testing.assert_allclose(float(got["graphs_with_bridge_pos"]), with_bridge_pos)
    # The reference's compute() ratios (retriever_metrics.py:321-327).
    np.testing.assert_allclose(
        float(got["bridge_pos_edges"]) / max(float(got["total_pos_edges"]), 1.0),
        bridge_pos / max(total_pos, 1.0), rtol=1e-6,
    )


def test_score_margin_matches_torch_oracle(batch_and_views):
    batch, scores, views = batch_and_views
    res = jax.jit(lambda s: score_margin(s, batch.edge_labels, batch))(scores)
    acc = MetricAccumulator()
    acc.update(res, res["graph_valid"])
    got = acc.compute()

    margin_sum = 0.0
    count = 0
    for v in views:
        has_pos = bool(v.labels.any())
        has_neg = bool((~v.labels).any())
        if not has_pos or not has_neg:
            continue  # retriever_metrics.py:381-384
        margin_sum += float(v.scores[v.labels].min() - v.scores[~v.labels].max())
        count += 1
    assert count > 0
    np.testing.assert_allclose(got["margin"], margin_sum / count, rtol=1e-5)


def test_prob_quality_matches_torch_oracle(batch_and_views):
    batch, scores, views = batch_and_views
    res = jax.jit(
        lambda s: prob_quality(s, batch.edge_labels, batch, subset_mask=~batch.edge_is_near)
    )(scores)
    acc = MetricAccumulator()
    acc.update(res, res["graph_valid"])
    got = acc.compute()

    pos_sum = neg_sum = sep_sum = 0.0
    count = 0
    for v in views:
        bridge = _oracle_bridge_mask(v)
        s, lab = v.scores[bridge], v.labels[bridge]
        if s.numel() == 0 or not bool(lab.any()) or not bool((~lab).any()):
            continue  # retriever_metrics.py:455-461
        probs = torch.sigmoid(s)
        pm = float(probs[lab].mean())
        nm = float(probs[~lab].mean())
        pos_sum += pm
        neg_sum += nm
        sep_sum += pm - nm
        count += 1
    assert count > 0
    np.testing.assert_allclose(got["pos_prob"], pos_sum / count, rtol=1e-5)
    np.testing.assert_allclose(got["neg_prob"], neg_sum / count, rtol=1e-5)
    np.testing.assert_allclose(got["separation"], sep_sum / count, rtol=1e-4)


# --------------------------------------------------------------------- #
# AnswerReachability: incremental union-find oracle
# (reachability.py:296-381, _compute_reachability_at_k).
# --------------------------------------------------------------------- #


def _uf_find(parent, x):
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x


def _oracle_reachability(v: GraphView, k_values) -> dict[int, bool] | None:
    num_edges = int(v.scores.numel())
    if num_edges <= 0 or v.q_local.numel() == 0 or v.a_local.numel() == 0:
        return None  # reachability.py:144-166: graph skipped entirely
    max_k = max(k_values)
    k_top = min(num_edges, max_k)
    top_idx = torch.topk(v.scores, k=k_top, largest=True, sorted=True).indices
    parent = list(range(v.num_nodes))
    rank = [0] * v.num_nodes
    starts = v.q_local.tolist()
    answers = v.a_local.tolist()
    k_check = sorted({min(int(k), k_top) for k in k_values})
    reach_map: dict[int, bool] = {}
    next_idx = 0

    def reachable():
        roots = {_uf_find(parent, s) for s in starts}
        return any(_uf_find(parent, a) in roots for a in answers)

    for idx in range(k_top):
        u = int(v.edge_index[0, top_idx[idx]])
        w = int(v.edge_index[1, top_idx[idx]])
        pa, pb = _uf_find(parent, u), _uf_find(parent, w)
        if pa != pb:
            if rank[pa] < rank[pb]:
                parent[pa] = pb
            elif rank[pa] > rank[pb]:
                parent[pb] = pa
            else:
                parent[pb] = pa
                rank[pa] += 1
        while next_idx < len(k_check) and idx + 1 >= k_check[next_idx]:
            reach_map[k_check[next_idx]] = reachable()
            next_idx += 1
    while next_idx < len(k_check):
        reach_map[k_check[next_idx]] = reachable()
        next_idx += 1
    return {int(k): reach_map[min(int(k), k_top)] for k in k_values}


def test_reachability_matches_union_find_oracle(batch_and_views):
    batch, scores, views = batch_and_views
    res = jax.jit(lambda s: answer_reachability_at_k(s, batch, K_GRID))(scores)
    acc = MetricAccumulator()
    acc.update(
        {k: v.astype(np.float32) if k != "graph_valid" else v for k, v in res.items()},
        res["graph_valid"],
    )
    got = acc.compute()

    hits = {k: 0.0 for k in K_GRID}
    valid = 0
    for v in views:
        rm = _oracle_reachability(v, K_GRID)
        if rm is None:
            continue
        valid += 1
        for k in K_GRID:
            hits[k] += float(rm[k])
    assert valid == len(views) - 1  # zero-edge graph excluded, as in reference
    for k in K_GRID:
        np.testing.assert_allclose(got[f"reachability@{k}"], hits[k] / valid, rtol=1e-6)


# --------------------------------------------------------------------- #
# Offline ranking suite: torch oracles transcribed from utils/metrics.py.
# --------------------------------------------------------------------- #


def _oracle_ndcg(ranked_labels: torch.Tensor, k: int) -> float:
    trunc = ranked_labels[:k]
    if trunc.numel() == 0:
        return 0.0
    positions = torch.arange(1, trunc.numel() + 1, dtype=torch.float32)
    discounts = 1.0 / torch.log2(positions + 1.0)
    dcg = float((trunc * discounts).sum())
    ideal = torch.sort(ranked_labels, descending=True).values[:k]
    ideal_dcg = float((ideal * discounts[: ideal.numel()]).sum())
    return 0.0 if ideal_dcg <= 0 else dcg / ideal_dcg


def _oracle_ranking_metrics(samples, k_values):
    """compute_ranking_metrics (utils/metrics.py:112-169)."""
    totals = {k: {"precision": 0.0, "recall": 0.0, "f1": 0.0, "ndcg": 0.0, "count": 0.0}
              for k in k_values}
    mrr_sum, mrr_count = 0.0, 0
    for sample in samples:
        scores = torch.as_tensor(sample["scores"], dtype=torch.float32)
        labels = torch.as_tensor(sample["labels"], dtype=torch.float32)
        positives = int(labels.sum())
        if positives <= 0:
            continue
        order = torch.argsort(scores, descending=True)
        ranked = labels[order]
        pos_idx = torch.nonzero(ranked > 0.5)
        if pos_idx.numel() > 0:
            mrr_sum += 1.0 / float(pos_idx[0] + 1)
            mrr_count += 1
        for k in k_values:
            hits = float(ranked[:k].sum())
            precision = hits / float(k)
            recall = hits / float(positives)
            f1 = 0.0 if (precision + recall) == 0 else 2 * precision * recall / (precision + recall)
            stat = totals[k]
            stat["precision"] += precision
            stat["recall"] += recall
            stat["f1"] += f1
            stat["ndcg"] += _oracle_ndcg(ranked, k)
            stat["count"] += 1.0
    out = {}
    for k, stat in totals.items():
        c = stat["count"] or 1.0
        out[k] = (stat["precision"] / c, stat["recall"] / c, stat["f1"] / c, stat["ndcg"] / c)
    mrr = mrr_sum / mrr_count if mrr_count else 0.0
    return out, mrr


def _random_ranking_samples(seed, n=12):
    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n):
        e = int(rng.integers(3, 40))
        labels = (rng.random(e) < 0.3).astype(np.float64)
        if i % 5 == 0:
            labels[:] = 0.0  # zero-positive sample: skipped by both
        samples.append({
            "scores": rng.normal(size=e),
            "labels": labels,
            "head_ids": rng.integers(0, 30, size=e),
            "tail_ids": rng.integers(0, 30, size=e),
            "answer_ids": rng.integers(0, 30, size=int(rng.integers(0, 4))),
        })
    return samples


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ranking_metrics_match_torch_oracle(seed):
    samples = _random_ranking_samples(seed)
    ks = [1, 3, 5, 10]
    got = compute_ranking_metrics(samples, ks)
    want, want_mrr = _oracle_ranking_metrics(samples, ks)
    for k in ks:
        np.testing.assert_allclose(got.precision_at_k[k], want[k][0], rtol=1e-6)
        np.testing.assert_allclose(got.recall_at_k[k], want[k][1], rtol=1e-6)
        np.testing.assert_allclose(got.f1_at_k[k], want[k][2], rtol=1e-6)
        np.testing.assert_allclose(got.ndcg_at_k[k], want[k][3], rtol=1e-5)
    np.testing.assert_allclose(got.mrr, want_mrr, rtol=1e-6)


def _oracle_answer_sweep(samples, k_values, *, hit_only):
    """compute_answer_recall / compute_answer_hit (utils/metrics.py:172-238)."""
    ks = sorted(k_values)
    max_k = max(ks)
    vals = {k: [] for k in ks}
    for sample in samples:
        answer_ids = torch.as_tensor(sample["answer_ids"], dtype=torch.long)
        if answer_ids.numel() == 0:
            continue
        answers = set(int(x) for x in answer_ids.tolist())
        scores = torch.as_tensor(sample["scores"], dtype=torch.float32)
        order = torch.argsort(scores, descending=True)
        head_ids = list(np.asarray(sample["head_ids"]).tolist())
        tail_ids = list(np.asarray(sample["tail_ids"]).tolist())
        found = set()
        k_ptr = 0
        for rank_idx, edge_idx in enumerate(order.tolist()[:max_k], start=1):
            if head_ids[edge_idx] in answers:
                found.add(head_ids[edge_idx])
            if tail_ids[edge_idx] in answers:
                found.add(tail_ids[edge_idx])
            while k_ptr < len(ks) and rank_idx == ks[k_ptr]:
                vals[ks[k_ptr]].append(
                    (1.0 if found else 0.0) if hit_only else len(found) / len(answers)
                )
                k_ptr += 1
        last = (1.0 if found else 0.0) if hit_only else len(found) / len(answers)
        while k_ptr < len(ks):
            vals[ks[k_ptr]].append(last)
            k_ptr += 1
    return {k: (sum(v) / len(v) if v else 0.0) for k, v in vals.items()}


@pytest.mark.parametrize("seed", [3, 4])
def test_answer_recall_hit_match_torch_oracle(seed):
    samples = _random_ranking_samples(seed)
    ks = [1, 5, 10]
    got_r = compute_answer_recall(samples, ks)
    got_h = compute_answer_hit(samples, ks)
    want_r = _oracle_answer_sweep(samples, ks, hit_only=False)
    want_h = _oracle_answer_sweep(samples, ks, hit_only=True)
    for k in ks:
        np.testing.assert_allclose(got_r[f"answer_recall@{k}"], want_r[k], rtol=1e-6)
        np.testing.assert_allclose(got_h[f"answer_hit@{k}"], want_h[k], rtol=1e-6)


# --------------------------------------------------------------------- #
# BFS shortest-path-union supervision: deque-BFS oracle transcribed from
# build_retrieval_pipeline.py:599-830 (_bfs_dist + per-pair union masks).
# --------------------------------------------------------------------- #


def _oracle_bfs_dist(num_nodes, adjacency, sources):
    dist = [-1] * num_nodes
    q = deque()
    for s in sources:
        s = int(s)
        if 0 <= s < num_nodes and dist[s] < 0:
            dist[s] = 0
            q.append(s)
    while q:
        u = q.popleft()
        du = dist[u] + 1
        for v in adjacency[u]:
            if dist[v] >= 0:
                continue
            dist[v] = du
            q.append(v)
    return np.asarray(dist, dtype=np.int64)


def _oracle_pair_union(num_nodes, edge_src, edge_dst, sources, targets, *, directed):
    """_shortest_path_union_mask_by_pair[_directed] (lines 691-815)."""
    num_edges = len(edge_src)
    if num_nodes <= 0 or num_edges == 0 or not len(sources) or not len(targets):
        return np.zeros(num_edges, bool), [], [], [], [], []
    src = np.asarray(edge_src, np.int64)
    dst = np.asarray(edge_dst, np.int64)
    valid = (src >= 0) & (dst >= 0) & (src < num_nodes) & (dst < num_nodes)
    vidx = np.nonzero(valid)[0]
    starts = sorted({int(s) for s in sources if 0 <= int(s) < num_nodes})
    answers = sorted({int(t) for t in targets if 0 <= int(t) < num_nodes})
    if vidx.size == 0 or not starts or not answers:
        return np.zeros(num_edges, bool), [], [], [], [], []
    vs, vd = src[vidx], dst[vidx]

    def adj(es, ed):
        a = [[] for _ in range(num_nodes)]
        for u, w in zip(es, ed):
            if 0 <= u < num_nodes and 0 <= w < num_nodes:
                a[int(u)].append(int(w))
        for nbrs in a:
            nbrs.sort()
        return a

    if directed:
        fwd = adj(src, dst)
        rev = adj(dst, src)
        dist_from = {s: _oracle_bfs_dist(num_nodes, fwd, [s]) for s in starts}
        dist_to = {a: _oracle_bfs_dist(num_nodes, rev, [a]) for a in answers}
    else:
        und = adj(np.concatenate([src, dst]), np.concatenate([dst, src]))
        dist_from = {s: _oracle_bfs_dist(num_nodes, und, [s]) for s in starts}
        dist_to = {a: _oracle_bfs_dist(num_nodes, und, [a]) for a in answers}

    mask = np.zeros(num_edges, bool)
    p_s, p_a, p_ids, p_cnt, p_len = [], [], [], [], []
    for s in starts:
        ds = dist_from[s]
        for a in answers:
            da = dist_to[a]
            dsa = int(ds[a])
            if dsa < 0:
                continue
            p_s.append(s)
            p_a.append(a)
            p_len.append(dsa)
            keep = (ds[vs] >= 0) & (da[vd] >= 0) & (ds[vs] + 1 + da[vd] == dsa)
            if not directed:
                keep |= (ds[vd] >= 0) & (da[vs] >= 0) & (ds[vd] + 1 + da[vs] == dsa)
            ids = vidx[np.nonzero(keep)[0]]
            if ids.size:
                mask[ids] = True
                p_ids.extend(ids.tolist())
            p_cnt.append(int(ids.size))
    return mask, p_s, p_a, p_ids, p_cnt, p_len


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("path_mode", ["undirected", "qa_directed"])
def test_bfs_supervision_matches_reference_oracle(seed, path_mode):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(6, 30))
    e = int(rng.integers(4, 80))
    src = rng.integers(-1, n, size=e)  # includes a few invalid endpoints
    dst = rng.integers(0, n + 1, size=e)  # includes out-of-range endpoints
    sources = rng.integers(0, n, size=int(rng.integers(1, 4)))
    targets = rng.integers(0, n, size=int(rng.integers(1, 4)))

    got = shortest_path_union_by_pair(
        num_nodes=n, edge_src=src, edge_dst=dst, sources=sources,
        targets=targets, path_mode=path_mode,
    )
    want = _oracle_pair_union(
        n, src, dst, sources, targets, directed=path_mode == "qa_directed"
    )
    np.testing.assert_array_equal(np.asarray(got[0]), want[0])
    assert list(got[1]) == want[1]          # pair_start_nodes
    assert list(got[2]) == want[2]          # pair_answer_nodes
    assert list(got[3]) == want[3]          # pair_edge_local_ids (exact CSR order)
    assert list(got[4]) == want[4]          # pair_edge_counts
    assert list(got[5]) == want[5]          # pair_shortest_lengths
