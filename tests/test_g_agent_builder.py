"""Agent-graph builder: calibration, selection, dedup, pairs, dummies."""

import numpy as np
import pytest

from evi_rag_tpu.data.g_agent import (
    AgentSettings,
    build_agent_sample,
    node_softmax_logit,
    select_start_edges,
    select_topk_edges,
)


def test_node_softmax_logit_matches_dense():
    scores = np.array([1.0, 2.0, 0.5], np.float32)
    heads = np.array([0, 0, 1])
    tails = np.array([1, 2, 2])
    out = node_softmax_logit(scores, heads, tails, 3)
    # Head-side probs for node 0's edges: softmax([1, 2]).
    ph = np.exp([1.0, 2.0]) / np.exp([1.0, 2.0]).sum()
    # Tail-side: node1 gets edge0 alone (p=1), node2: softmax([2, .5]).
    pt2 = np.exp([2.0, 0.5]) / np.exp([2.0, 0.5]).sum()
    p0 = 0.5 * (ph[0] + 1.0)
    want0 = np.log(p0) - np.log1p(-p0)
    np.testing.assert_allclose(out[0], want0, rtol=1e-5)
    p1 = 0.5 * (ph[1] + pt2[0])
    want1 = np.log(p1) - np.log1p(-p1)
    np.testing.assert_allclose(out[1], want1, rtol=1e-5)


def test_select_topk():
    s = np.array([0.1, 0.9, 0.5, 0.7], np.float32)
    np.testing.assert_array_equal(select_topk_edges(s, 2), [1, 3])
    np.testing.assert_array_equal(select_topk_edges(s, 10), [0, 1, 2, 3])


def test_select_start_edges_degree_proportional():
    # Node 0 is start with degree 4; ratio .5 -> keep top-2 incident edges.
    heads = np.array([0, 0, 0, 1, 2])
    tails = np.array([1, 2, 3, 0, 3])
    scores = np.array([0.9, 0.1, 0.5, 0.8, 0.99], np.float32)
    out = select_start_edges(
        heads=heads, tails=tails, scores=scores, start_nodes=np.array([0]),
        num_nodes=4, keep_ratio=0.5, min_edges=1, max_edges=None,
    )
    np.testing.assert_array_equal(out, [0, 3])  # scores .9 and .8 incident to 0


def _sample_kwargs(scores=None):
    heads = np.array([0, 1, 2, 0, 3])
    tails = np.array([1, 2, 3, 2, 4])
    return dict(
        sample_id="t0",
        question_id=0,
        heads=heads,
        tails=tails,
        relations=np.array([0, 1, 2, 3, 4]),
        labels=np.array([1, 1, 0, 0, 0], np.float32),
        scores=scores if scores is not None else np.array([2.0, 1.5, 0.1, 0.2, -1.0], np.float32),
        node_entity_ids=np.array([100, 101, 102, 103, 104]),
        node_embedding_ids=np.array([1, 2, 0, 4, 5]),
        start_entity_ids=np.array([100]),
        answer_entity_ids=np.array([102]),
    )


def test_build_agent_sample_basic():
    s = build_agent_sample(
        settings=AgentSettings(edge_top_k=3, max_hops=3, score_mode="logits"),
        **_sample_kwargs(),
    )
    assert s is not None
    assert s.is_answer_reachable and not s.is_dummy_agent
    # Answer 102 must be in the subgraph, start 100 too.
    assert 100 in s.node_entity_ids and 102 in s.node_entity_ids
    # Pairs computed on the agent graph.
    assert s.pair_shortest_len.size >= 1
    assert (s.pair_shortest_len >= 1).all()
    # Labels survive aggregation for kept positive edges.
    assert s.edge_labels.max() == 1.0


def test_build_agent_dedup():
    # Duplicate (h, r, t) triples collapse with max-score/max-label.
    kw = _sample_kwargs()
    kw["heads"] = np.array([0, 0, 1])
    kw["tails"] = np.array([1, 1, 2])
    kw["relations"] = np.array([7, 7, 1])
    kw["scores"] = np.array([0.3, 0.9, 0.5], np.float32)
    kw["labels"] = np.array([1.0, 0.0, 1.0], np.float32)
    s = build_agent_sample(settings=AgentSettings(edge_top_k=5, score_mode="logits", max_hops=0), **kw)
    assert s is not None
    assert s.num_edges == 2
    i = int(np.nonzero(s.edge_relations == 7)[0][0])
    assert s.edge_labels[i] == 1.0  # max label
    assert s.edge_scores[i] == pytest.approx(0.9)  # max score


def test_build_agent_dummy_and_drop():
    kw = _sample_kwargs()
    kw["answer_entity_ids"] = np.array([999])  # absent from graph
    assert build_agent_sample(settings=AgentSettings(edge_top_k=3), **kw) is None
    s = build_agent_sample(settings=AgentSettings(edge_top_k=3, allow_empty_answer=True), **kw)
    assert s is not None and s.is_dummy_agent
    assert (s.edge_labels == 0).all()
    assert s.pair_shortest_len.size == 0


def test_hop_filter_prunes_far_edges():
    kw = _sample_kwargs()
    # max_hops=1: only edges touching the start component within 1 hop remain.
    s = build_agent_sample(
        settings=AgentSettings(edge_top_k=5, max_hops=1, apply_hop_filter=True,
                               score_mode="logits", allow_empty_answer=True),
        **kw,
    )
    assert s is not None
    # edge (3->4) requires nodes at distance >=2 from start 0; must be gone.
    assert 104 not in s.node_entity_ids


def test_hop_filter_drops_sample_when_nothing_in_radius():
    """If every selected edge lies beyond max_hops of the starts, the sample
    is dropped — never silently kept with out-of-radius edges."""
    kw = _sample_kwargs()
    # Start node 4 only appears as the tail of edge (3->4); with
    # start_max_edges=0 no start-incident edge is forced in, and top-k
    # selection keeps edges that are all >=1 hop away from node 4's radius-0
    # neighborhood when max_hops is minimal and the start's own edge loses.
    kw["start_entity_ids"] = np.array([104])  # global id of node 4
    scores = np.array([5.0, 4.0, 3.0, 2.0, -10.0], np.float32)  # (3->4) last
    kw["scores"] = scores
    s = build_agent_sample(
        settings=AgentSettings(edge_top_k=2, max_hops=1, apply_hop_filter=True,
                               start_max_edges=0, score_mode="logits",
                               allow_empty_answer=True),
        **kw,
    )
    assert s is None


def test_build_agent_disconnected_answer_has_empty_pairs():
    """Answer in the env graph but in a different component than every start:
    the sample is reachable (reference semantics: answer-in-graph,
    g_agent_builder.py:483), pair supervision is legitimately EMPTY, and the
    sample must survive validate() + a store round-trip (observed at WebQSP
    scale after top-k edge selection)."""
    kw = _sample_kwargs()
    # Two components: {0,1} and {2,3}. Start at node 0's entity, answer at
    # node 3's entity — present, but unreachable from the start.
    kw["heads"] = np.array([0, 2])
    kw["tails"] = np.array([1, 3])
    kw["relations"] = np.array([0, 1])
    kw["labels"] = np.array([0.0, 1.0], np.float32)
    kw["scores"] = np.array([1.0, 2.0], np.float32)
    kw["node_entity_ids"] = np.array([100, 101, 102, 103])
    kw["node_embedding_ids"] = np.array([1, 2, 3, 4])
    kw["start_entity_ids"] = np.array([100])
    kw["answer_entity_ids"] = np.array([103])
    s = build_agent_sample(
        settings=AgentSettings(edge_top_k=2, max_hops=0, score_mode="logits"),
        **kw,
    )
    assert s is not None
    assert s.is_answer_reachable and not s.is_dummy_agent
    assert s.pair_start_local.size == 0
    s.validate()  # must not raise

    from evi_rag_tpu.eval.artifacts import load_agent_store, save_agent_store

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        save_agent_store([s], td, split="train")
        loaded = load_agent_store(td)
        assert len(loaded) == 1
        assert loaded[0].is_answer_reachable
        assert loaded[0].pair_start_local.size == 0


def test_agent_sample_validator_rejects_corruption():
    """Strict validator catches the reference's _parse_sample error classes:
    range violations, redundant-field disagreement, flag inconsistency."""
    import dataclasses

    import pytest

    from evi_rag_tpu.data.g_agent import AgentSample

    ok = AgentSample(
        sample_id="v0", question_id=0, num_nodes=3,
        edge_head_locals=np.array([0, 1]), edge_tail_locals=np.array([1, 2]),
        edge_relations=np.array([0, 1]), edge_scores=np.array([0.5, -0.5], np.float32),
        edge_labels=np.array([1.0, 1.0], np.float32),
        node_entity_ids=np.array([10, 11, 12]), node_embedding_ids=np.array([1, 2, 0]),
        start_entity_ids=np.array([10]), answer_entity_ids=np.array([12]),
        start_node_locals=np.array([0]), answer_node_locals=np.array([2]),
        pair_start_local=np.array([0]), pair_answer_local=np.array([2]),
        pair_shortest_len=np.array([2]),
        is_answer_reachable=True, is_dummy_agent=False,
    )
    ok.validate()

    bad_cases = [
        {"edge_tail_locals": np.array([1, 5])},                    # out of range
        {"edge_scores": np.array([np.nan, 0.0], np.float32)},      # non-finite
        {"start_node_locals": np.array([], np.int64)},             # empty starts
        {"answer_node_locals": np.array([1])},                     # id mismatch
        {"is_dummy_agent": True},                                  # flags inconsistent
        {"pair_shortest_len": np.array([2, 3])},                   # pair length
    ]
    for patch in bad_cases:
        bad = dataclasses.replace(ok, **patch)
        with pytest.raises(ValueError):
            bad.validate()


def test_retrieval_sample_validator_cross_checks():
    import dataclasses

    import pytest

    from evi_rag_tpu.data.sample import RetrievalSample

    ok = RetrievalSample(
        sample_id="r0", num_nodes=3,
        edge_index=np.array([[0, 1], [1, 2]], np.int32),
        edge_relations=np.array([0, 1]),
        node_embedding_ids=np.array([1, 2, 0]),
        topic_locals=np.array([0]), answer_locals=np.array([2]),
        edge_labels=np.array([True, True]),
        pair_start_local=np.array([0], np.int32),
        pair_answer_local=np.array([2], np.int32),
        pair_shortest_len=np.array([2], np.int32),
        question_id=0,
    )
    ok.validate()
    with pytest.raises(ValueError):  # duplicate topics
        dataclasses.replace(ok, topic_locals=np.array([0, 0])).validate()
    with pytest.raises(ValueError):  # zero-length pair with distinct endpoints
        dataclasses.replace(ok, pair_shortest_len=np.array([0], np.int32)).validate()
    with pytest.raises(ValueError):  # labels without pair supervision
        dataclasses.replace(
            ok,
            pair_start_local=np.array([], np.int32),
            pair_answer_local=np.array([], np.int32),
            pair_shortest_len=np.array([], np.int32),
        ).validate()
