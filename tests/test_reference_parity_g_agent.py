"""Differential parity of the g_agent sample construction against a torch
oracle transcribed line-by-line from the reference builder
(``src/data/components/g_agent_builder.py:238-512`` plus its helpers
``_node_softmax_logit`` :596-629, ``_select_topk_edges`` :644-652,
``_select_start_edges`` :654-724):

selection-score calibration -> global top-k (stable) -> per-start-node
degree-proportional edges -> union -> dedup by GLOBAL (h, r, t) with
max-score/max-label aggregation -> sorted node re-index -> start/answer
local resolution -> dummy-agent path for empty answers -> final-score
recalibration on the agent graph.

The repo emits deduped triples in lexicographic order (np.unique) where the
reference emits first-appearance order, so equality is asserted on the
order-free semantic content: the triple -> (score, label) map, the sorted
node/embedding tables, anchor entity sets, and the dummy/reachability flags.
Calibration + start-edge selection index parity is pinned separately in
``tests/test_reference_parity.py``.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from evi_rag_tpu.data.g_agent import AgentSettings, build_agent_sample

PROB_EPS = 1e-6


# --------------------------------------------------------------------- #
# Oracle helpers (torch transcriptions).
# --------------------------------------------------------------------- #


def _o_node_softmax_logit(scores, heads, tails, num_nodes):
    if scores.numel() == 0:
        return scores
    out_probs = []
    for idx in (heads, tails):
        mx = torch.full((num_nodes,), float("-inf"))
        mx.scatter_reduce_(0, idx, scores, reduce="amax", include_self=True)
        ex = torch.exp(scores - mx[idx])
        sm = torch.zeros(num_nodes)
        sm.scatter_add_(0, idx, ex)
        out_probs.append(ex / sm[idx].clamp_min(PROB_EPS))
    prob = (out_probs[0] + out_probs[1]) * 0.5
    prob = prob.clamp(min=PROB_EPS, max=1.0 - PROB_EPS)
    return torch.log(prob) - torch.log1p(-prob)


def _o_normalize(scores, heads, tails, num_nodes, score_mode):
    if score_mode == "logits":
        return scores
    return _o_node_softmax_logit(scores, heads, tails, num_nodes)


def _o_topk(scores, k):
    n = int(scores.numel())
    if n <= k:
        return torch.arange(n, dtype=torch.long)
    return torch.argsort(scores, descending=True, stable=True)[:k]


def _o_start_edges(heads, tails, scores, start_nodes, num_nodes,
                   keep_ratio, min_edges, max_edges):
    start_nodes = torch.unique(start_nodes.view(-1))
    if start_nodes.numel() == 0 or scores.numel() == 0:
        return torch.empty(0, dtype=torch.long)
    deg = torch.bincount(heads, minlength=num_nodes) + torch.bincount(tails, minlength=num_nodes)
    deg_s = deg[start_nodes]
    k_s = torch.ceil(deg_s.to(torch.float32) * keep_ratio).to(torch.long)
    if min_edges > 0:
        k_s = torch.maximum(k_s, torch.full_like(k_s, min_edges))
    if max_edges is not None:
        if int(max_edges) == 0:
            k_s = torch.zeros_like(k_s)
        else:
            k_s = torch.minimum(k_s, torch.full_like(k_s, int(max_edges)))
    k_s = torch.minimum(k_s, deg_s)
    if k_s.numel() == 0 or int(k_s.max()) == 0:
        return torch.empty(0, dtype=torch.long)
    e = int(scores.numel())
    inc_nodes = torch.cat([heads, tails])
    inc_edges = torch.cat([torch.arange(e), torch.arange(e)])
    inc_scores = torch.cat([scores, scores])
    mask = torch.zeros(num_nodes, dtype=torch.bool)
    mask[start_nodes] = True
    keep = mask[inc_nodes]
    nodes, edges, sc = inc_nodes[keep], inc_edges[keep], inc_scores[keep]
    o1 = torch.argsort(sc, descending=True, stable=True)
    nodes1, edges1 = nodes[o1], edges[o1]
    o2 = torch.argsort(nodes1, stable=True)
    nodes2, edges2 = nodes1[o2], edges1[o2]
    counts = torch.bincount(nodes2, minlength=num_nodes)
    offsets = torch.cumsum(counts, 0) - counts
    pos = torch.arange(nodes2.numel()) - offsets[nodes2]
    k_per = torch.zeros(num_nodes, dtype=torch.long)
    k_per[start_nodes] = k_s
    sel = pos < k_per[nodes2]
    if not bool(sel.any()):
        return torch.empty(0, dtype=torch.long)
    return torch.unique(edges2[sel], sorted=True)


def _oracle_build(heads, tails, relations, labels, scores, node_entity_ids,
                  node_embedding_ids, start_entity_ids, answer_entity_ids,
                  st: AgentSettings):
    """``_build_and_add_sample`` (g_agent_builder.py:238-512) -> semantic dict
    (or None for a dropped sample)."""
    heads = torch.as_tensor(heads, dtype=torch.long)
    tails = torch.as_tensor(tails, dtype=torch.long)
    relations = torch.as_tensor(relations, dtype=torch.long)
    labels = torch.as_tensor(labels, dtype=torch.float32)
    scores = torch.as_tensor(scores, dtype=torch.float32)
    node_global = torch.as_tensor(node_entity_ids, dtype=torch.long)
    node_emb = torch.as_tensor(node_embedding_ids, dtype=torch.long)
    start_ids = torch.as_tensor(start_entity_ids, dtype=torch.long)
    answer_ids = torch.as_tensor(answer_entity_ids, dtype=torch.long)
    num_nodes = int(node_global.numel())
    if heads.numel() == 0:
        return None

    start_mask = torch.isin(node_global, start_ids.view(-1))
    if not bool(start_mask.any()):
        return None
    start_locals_ret = torch.nonzero(start_mask).view(-1)

    select_scores = _o_normalize(scores, heads, tails, num_nodes, st.score_mode)
    topk = _o_topk(select_scores, int(st.edge_top_k))
    start_sel = _o_start_edges(
        heads, tails, select_scores, start_locals_ret, num_nodes,
        float(st.start_keep_ratio), int(st.start_min_edges), st.start_max_edges,
    )
    if topk.numel() == 0:
        return None
    cands = [topk] + ([start_sel] if start_sel.numel() else [])
    env = torch.unique(torch.cat(cands), sorted=True)
    if env.numel() == 0:
        return None

    # Dedup by global triple (first-appearance order; max-agg score/label).
    agg = {}
    for off in range(int(env.numel())):
        i = int(env[off])
        trip = (int(node_global[heads[i]]), int(relations[i]), int(node_global[tails[i]]))
        sc, lb = float(scores[i]), float(labels[i])
        a = agg.get(trip)
        if a is None:
            agg[trip] = {"score": sc, "label": lb}
        else:
            a["score"] = max(a["score"], sc)
            a["label"] = max(a["label"], lb)
    triples = list(agg.keys())
    if not triples:
        return None
    hg = torch.tensor([t[0] for t in triples], dtype=torch.long)
    rg = torch.tensor([t[1] for t in triples], dtype=torch.long)
    tg = torch.tensor([t[2] for t in triples], dtype=torch.long)
    e_scores = torch.tensor([agg[t]["score"] for t in triples])
    e_labels = torch.tensor([agg[t]["label"] for t in triples])

    new_nodes, _ = torch.sort(torch.cat([hg, tg]).unique())
    node_map = {int(g): i for i, g in enumerate(new_nodes)}
    emb_lookup = {int(g): int(e) for g, e in zip(node_global, node_emb)}
    new_emb = torch.tensor([emb_lookup[int(g)] for g in new_nodes], dtype=torch.long)
    new_heads = torch.tensor([node_map[int(h)] for h in hg], dtype=torch.long)
    new_tails = torch.tensor([node_map[int(t)] for t in tg], dtype=torch.long)
    e_scores = _o_normalize(e_scores, new_heads, new_tails, int(new_nodes.numel()), st.score_mode)

    start_locals = []
    for g in start_ids.tolist():
        m = node_map.get(int(g))
        if m is not None and m not in start_locals:
            start_locals.append(m)
    if not start_locals:
        return None
    seen, ordered_answers = set(), []
    for a in answer_ids.tolist():
        if int(a) not in seen:
            seen.add(int(a))
            ordered_answers.append(int(a))
    answer_locals = [node_map[a] for a in ordered_answers if a in node_map]

    is_dummy = not answer_locals
    if is_dummy and not st.allow_empty_answer:
        return None
    if is_dummy:
        e_labels = torch.zeros_like(e_labels)
    return {
        "triple_attrs": {
            (int(new_nodes[new_heads[i]]), int(rg[i]), int(new_nodes[new_tails[i]])):
                (float(e_scores[i]), float(e_labels[i]))
            for i in range(len(triples))
        },
        "node_entity_ids": new_nodes.tolist(),
        "node_embedding_ids": new_emb.tolist(),
        "start_local_set": set(start_locals),
        "answer_locals": answer_locals,
        "answer_entity_ids": ordered_answers,
        "is_dummy": is_dummy,
        "is_reachable": not is_dummy,
    }


# --------------------------------------------------------------------- #
# Random retrieval subgraphs, incl. duplicate triples + missing answers.
# --------------------------------------------------------------------- #


def _random_graph(seed, *, force_dup=True):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 16))
    e = int(rng.integers(6, 40))
    heads = rng.integers(0, n, size=e)
    tails = rng.integers(0, n, size=e)
    relations = rng.integers(0, 4, size=e)
    if force_dup and e >= 4:
        heads[1], tails[1], relations[1] = heads[0], tails[0], relations[0]  # dup triple
    labels = (rng.random(e) < 0.3).astype(np.float32)
    scores = rng.normal(size=e).astype(np.float32)
    node_entity_ids = rng.permutation(np.arange(100, 100 + n))
    node_embedding_ids = rng.integers(1, 500, size=n)
    starts = rng.choice(node_entity_ids, size=int(rng.integers(1, 3)), replace=False)
    if rng.random() < 0.5:
        answers = rng.choice(node_entity_ids, size=int(rng.integers(1, 3)), replace=False)
    else:
        answers = np.asarray([9999])  # not in the graph -> dummy/drop path
    return dict(
        heads=heads, tails=tails, relations=relations, labels=labels,
        scores=scores, node_entity_ids=node_entity_ids,
        node_embedding_ids=node_embedding_ids, start_entity_ids=starts,
        answer_entity_ids=np.concatenate([answers, answers[:1]]),  # dup answer
    )


SETTINGS_GRID = [
    AgentSettings(edge_top_k=8, score_mode="logits", allow_empty_answer=True, compute_pairs=False),
    AgentSettings(edge_top_k=8, score_mode="node_softmax", allow_empty_answer=True, compute_pairs=False),
    AgentSettings(edge_top_k=500, score_mode="node_softmax", allow_empty_answer=False, compute_pairs=False),
    AgentSettings(edge_top_k=5, start_keep_ratio=0.6, start_min_edges=2,
                  start_max_edges=3, score_mode="logits", allow_empty_answer=True,
                  compute_pairs=False),
    AgentSettings(edge_top_k=6, start_max_edges=0, score_mode="node_softmax",
                  allow_empty_answer=True, compute_pairs=False),
]


@pytest.mark.parametrize("seed", list(range(8)))
def test_agent_sample_matches_reference_oracle(seed):
    kw = _random_graph(seed)
    for st in SETTINGS_GRID:
        got = build_agent_sample(sample_id="s", question_id=0, settings=st, **kw)
        want = _oracle_build(kw["heads"], kw["tails"], kw["relations"],
                             kw["labels"], kw["scores"], kw["node_entity_ids"],
                             kw["node_embedding_ids"], kw["start_entity_ids"],
                             kw["answer_entity_ids"], st)
        if want is None:
            assert got is None, st
            continue
        assert got is not None, st
        got_attrs = {
            (int(got.node_entity_ids[got.edge_head_locals[i]]),
             int(got.edge_relations[i]),
             int(got.node_entity_ids[got.edge_tail_locals[i]])):
                (float(got.edge_scores[i]), float(got.edge_labels[i]))
            for i in range(got.num_edges)
        }
        assert set(got_attrs) == set(want["triple_attrs"]), st
        for trip, (s_w, l_w) in want["triple_attrs"].items():
            s_g, l_g = got_attrs[trip]
            np.testing.assert_allclose(s_g, s_w, rtol=1e-5, atol=1e-6, err_msg=str(trip))
            assert l_g == l_w, (st, trip)
        assert got.node_entity_ids.tolist() == want["node_entity_ids"], st
        assert got.node_embedding_ids.tolist() == want["node_embedding_ids"], st
        assert set(got.start_node_locals.tolist()) == want["start_local_set"], st
        assert got.answer_node_locals.tolist() == want["answer_locals"], st
        assert got.answer_entity_ids.tolist() == want["answer_entity_ids"], st
        assert got.is_dummy_agent == want["is_dummy"], st
        assert got.is_answer_reachable == want["is_reachable"], st
        if want["is_dummy"]:
            assert (got.edge_labels == 0).all(), st


def test_default_start_max_edges_is_edge_top_k():
    # Reference ``GAgentSettings.__post_init__`` (g_agent_builder.py:73-76).
    st = AgentSettings(edge_top_k=7)
    assert st.start_max_edges == 7
    st2 = AgentSettings(edge_top_k=7, start_max_edges=2)
    assert st2.start_max_edges == 2
