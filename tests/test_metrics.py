"""Metric correctness vs brute-force host references (incl. union-find reachability)."""

import jax
import numpy as np
import pytest

from evi_rag_tpu.data.feeder import Bucket, collate_retriever
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.eval.metrics import (
    answer_reachability_at_k,
    bridge_positive_coverage,
    edge_ranks_in_graph,
    edge_recall_at_k,
    normalize_k_values,
    prob_quality,
    score_margin,
)

K_GRID = [1, 5, 10, 25]


@pytest.fixture(scope="module")
def setup():
    ds = make_synthetic_dataset(num_samples=8, emb_dim=16, max_nodes=24, seed=7)
    bucket = Bucket(graphs=9, nodes=256, edges=2048)
    batch = collate_retriever(
        ds.samples, entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    rng = np.random.default_rng(11)
    scores = rng.normal(size=batch.graph.num_edges).astype(np.float32)
    return ds, batch, scores


def test_normalize_k_values():
    assert normalize_k_values([5, 1, 5, -2, 0]) == (1, 5)
    assert normalize_k_values(None) == ()


def test_edge_ranks(setup):
    _, batch, scores = setup
    ranks = np.asarray(
        jax.jit(edge_ranks_in_graph)(scores, batch.graph.edge_batch, batch.graph.edge_ptr)
    )
    eb = np.asarray(batch.graph.edge_batch)
    for g in range(batch.graph.num_graphs - 1):
        sel = np.nonzero(eb == g)[0]
        if sel.size == 0:
            continue
        order = sel[np.argsort(-scores[sel], kind="stable")]
        want = np.empty(sel.size, dtype=np.int64)
        want[np.searchsorted(sel, order)] = np.arange(sel.size)
        np.testing.assert_array_equal(ranks[sel], want)


def test_recall_at_k_vs_bruteforce(setup):
    _, batch, scores = setup
    out = jax.jit(lambda s: edge_recall_at_k(s, batch.edge_labels, batch, K_GRID))(scores)
    eb = np.asarray(batch.graph.edge_batch)
    labels = np.asarray(batch.edge_labels)
    emask = np.asarray(batch.graph.edge_mask)
    for g in range(batch.graph.num_graphs - 1):
        sel = (eb == g) & emask
        if not sel.any():
            continue
        s, y = scores[sel], labels[sel] > 0.5
        order = np.argsort(-s, kind="stable")
        pos = y.sum()
        for k in K_GRID:
            want = y[order[:k]].sum() / max(pos, 1e-8)
            np.testing.assert_allclose(float(out[f"recall@{k}"][g]), want, rtol=1e-5)


def test_bridge_recall_subset(setup):
    _, batch, scores = setup
    bridge = ~np.asarray(batch.edge_is_near)
    out = jax.jit(
        lambda s: edge_recall_at_k(
            s, batch.edge_labels, batch, [5], subset_mask=batch.edge_is_near == False,  # noqa: E712
            require_positive=True,
        )
    )(scores)
    eb = np.asarray(batch.graph.edge_batch)
    labels = np.asarray(batch.edge_labels)
    emask = np.asarray(batch.graph.edge_mask)
    valid = np.asarray(out["graph_valid"])
    for g in range(batch.graph.num_graphs - 1):
        sel = (eb == g) & emask & bridge
        y = labels[sel] > 0.5
        if not sel.any() or y.sum() == 0:
            assert not valid[g]
            continue
        assert valid[g]
        s = scores[sel]
        order = np.argsort(-s, kind="stable")
        want = y[order[:5]].sum() / y.sum()
        np.testing.assert_allclose(float(out["recall@5"][g]), want, rtol=1e-5)


def test_score_margin(setup):
    _, batch, scores = setup
    out = jax.jit(lambda s: score_margin(s, batch.edge_labels, batch))(scores)
    eb = np.asarray(batch.graph.edge_batch)
    labels = np.asarray(batch.edge_labels) > 0.5
    emask = np.asarray(batch.graph.edge_mask)
    for g in range(batch.graph.num_graphs - 1):
        sel = (eb == g) & emask
        y = labels[sel]
        if y.any() and (~y).any():
            want = scores[sel][y].min() - scores[sel][~y].max()
            np.testing.assert_allclose(float(out["margin"][g]), want, rtol=1e-5)
            assert bool(out["graph_valid"][g])


def test_prob_quality_and_coverage(setup):
    _, batch, scores = setup
    out = jax.jit(lambda s: prob_quality(s, batch.edge_labels, batch))(scores)
    assert np.isfinite(np.asarray(out["separation"])).all()
    cov = jax.jit(lambda: bridge_positive_coverage(batch.edge_labels, batch))()
    assert float(cov["total_pos_edges"]) >= float(cov["bridge_pos_edges"])


def _uf_reachable(edges, starts, answers, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        pu, pv = find(u), find(v)
        if pu != pv:
            parent[pu] = pv
    roots = {find(s) for s in starts}
    return any(find(a) in roots for a in answers)


def test_reachability_vs_union_find(setup):
    ds, batch, scores = setup
    out = jax.jit(lambda s: answer_reachability_at_k(s, batch, K_GRID))(scores)
    eb = np.asarray(batch.graph.edge_batch)
    emask = np.asarray(batch.graph.edge_mask)
    ei = np.asarray(batch.graph.edge_index)
    node_ptr = np.asarray(batch.graph.node_ptr)
    for g, s_g in enumerate(ds.samples):
        sel = np.nonzero((eb == g) & emask)[0]
        sc = scores[sel]
        order = sel[np.argsort(-sc, kind="stable")]
        n0 = node_ptr[g]
        starts = (s_g.topic_locals + n0).tolist()
        answers = (s_g.answer_locals + n0).tolist()
        for k in K_GRID:
            top = order[:k]
            edges = list(zip(ei[0, top].tolist(), ei[1, top].tolist()))
            want = _uf_reachable(edges, starts, answers, batch.graph.num_nodes)
            got = bool(out[f"reachability@{k}"][g])
            assert got == want, f"graph {g} k {k}: got {got} want {want}"
