"""Reasoner stack: llm metrics, prompting, oracle, chains, records, runner."""

import json

import numpy as np
import pytest

from evi_rag_tpu.data.chains import (
    ChainSettings,
    build_bfs_candidate_chains,
    chains_from_rollouts,
    textualize_chain,
)
from evi_rag_tpu.data.g_agent import AgentSample
from evi_rag_tpu.eval.llm_client import LLMConfig, init_llm, run_chat
from evi_rag_tpu.eval.llm_metrics import (
    PredictionParseError,
    evaluate_predictions,
    normalize_answer,
    parse_prediction,
    score_answers,
)
from evi_rag_tpu.eval.oracle import oracle_metrics_for_sample
from evi_rag_tpu.eval.prompting import build_triplet_prompt, count_tokens
from evi_rag_tpu.eval.reasoner import (
    ReasonerSettings,
    build_triplet_records,
    run_reasoner,
    select_visible_prefix_by_budget,
)


def test_normalize_and_match():
    assert normalize_answer("The Quick, Brown Fox!") == "quick brown fox"
    s = score_answers(["the quick brown fox"], ["Quick Brown Fox"])
    assert s["hit"] == 1.0 and s["f1"] == 1.0


def test_parse_prediction_strict():
    assert parse_prediction('{"answers": ["A", "B"]}') == ["A", "B"]
    assert parse_prediction('{"answers": [{"name": "X"}, ["Y"]]}') == ["X", "Y"]
    with pytest.raises(PredictionParseError):
        parse_prediction("not json")
    with pytest.raises(PredictionParseError):
        parse_prediction('{"no_answers": []}')
    with pytest.raises(PredictionParseError):
        parse_prediction('{"answers": "scalar"}')


def test_score_answers_greedy_prf():
    s = score_answers(["a", "b", "b"], ["a", "b", "c"])
    # greedy: a->a, b->b, second b unmatched.
    assert s["precision"] == pytest.approx(2 / 3)
    assert s["recall"] == pytest.approx(2 / 3)
    # set variants dedupe predictions: precision 2/2.
    assert s["set_precision"] == pytest.approx(1.0)
    assert s["set_exact"] == 0.0


def _pred_item(i, prediction, hit_set=True, hit_vis=True, wk=10):
    return {
        "id": f"q{i}",
        "answers": ["Paris"],
        "prediction": prediction,
        "hit_set": hit_set,
        "hit_vis": hit_vis,
        "visible_edge_ids": [1, 2],
        "evidence_token_count": 20,
        "prompt_token_count": 50,
        "token_budget": 100,
        "evidence_truncated": False,
        "window_k": wk,
    }


def test_evaluate_predictions_semantics():
    preds = [
        _pred_item(0, '{"answers": ["Paris"]}', hit_vis=True),
        _pred_item(1, '{"answers": ["London"]}', hit_vis=False),
        _pred_item(2, '{"answers": []}', hit_vis=True, wk=25),
    ]
    m = evaluate_predictions(preds)
    assert m["results/hit"] == pytest.approx(1 / 3)
    assert m["results/total"] == 3.0
    assert m["semantic/with_gt"] == 3.0
    # hit_vis samples: f1 [1, 0] -> acc_hit 0.5; miss: f1 0 -> acc_miss 0.
    assert m["semantic/acc_hit"] == pytest.approx(0.5)
    assert m["semantic/acc_miss"] == pytest.approx(0.0)
    assert m["semantic/s_ret_vis"] == pytest.approx(2 / 3)
    assert m["semantic/d_rate"] == pytest.approx(0.5)
    assert m["semantic/d_mass"] == pytest.approx(2 / 3 * 0.5)
    assert m["semantic/l_iface"] == pytest.approx(1.0 - 2 / 3)
    assert "results/window_10/hit" in m and "semantic/window_25/d_rate" in m
    # strict validation
    bad = _pred_item(9, '{"answers": []}')
    del bad["hit_set"]
    with pytest.raises(ValueError, match="hit_set"):
        evaluate_predictions([bad])


def test_oracle_metrics():
    out = oracle_metrics_for_sample(
        head_entity_ids=np.array([5, 1, 7]),
        tail_entity_ids=np.array([2, 9, 3]),
        answer_entity_ids=np.array([9, 3]),
        k_values=[1, 2, 3],
    )
    assert out["answer_hit@1"] == 0.0
    assert out["answer_hit@2"] == 1.0
    assert out["answer_recall@2"] == 0.5
    assert out["answer_recall@3"] == 1.0


def test_bfs_chains_and_rollout_chains():
    # 0 -> 1 -> 2, plus 2 -> 0
    kwargs = dict(
        num_nodes=3,
        heads=[0, 1, 2],
        tails=[1, 2, 0],
        relations=[0, 1, 2],
        scores=[1.0, 0.5, 0.1],
        node_entity_ids=[10, 11, 12],
    )
    chains = build_bfs_candidate_chains(
        start_nodes=[0], settings=ChainSettings(max_chain_length=2), **kwargs
    )
    assert chains
    assert chains[0]["rank"] == 1
    lens = {c["length"] for c in chains}
    assert lens <= {1, 2}
    text = textualize_chain(
        chains[0], id2entity={10: "A", 11: "B", 12: "C"}, id2relation={0: "r0", 1: "r1", 2: "r2"}
    )
    assert "A" in text or "B" in text

    roll_kwargs = {k: v for k, v in kwargs.items() if k != "num_nodes"}
    rc = chains_from_rollouts(
        actions_seqs=np.array([[0, 1, -1], [0, 1, -1], [2, -1, -1]]),
        directions_seqs=np.zeros((3, 3), int),
        **roll_kwargs,
        max_chains=10,
    )
    assert rc[0]["frequency"] == 2  # the repeated rollout ranks first
    assert rc[0]["edge_local_ids"] == [0, 1]


def test_budget_truncation():
    lines = ["token " * 10] * 8
    n, tokens, trunc = select_visible_prefix_by_budget(
        lines, token_budget=35, token_model="gpt-4o-mini"
    )
    assert 0 < n < 8 and trunc
    assert tokens <= 35
    n2, _, trunc2 = select_visible_prefix_by_budget(
        lines, token_budget=10_000, token_model="gpt-4o-mini"
    )
    assert n2 == 8 and not trunc2


def _agent_sample():
    return AgentSample(
        sample_id="s0",
        question_id=0,
        num_nodes=3,
        edge_head_locals=np.array([0, 1]),
        edge_tail_locals=np.array([1, 2]),
        edge_relations=np.array([0, 1]),
        edge_scores=np.array([0.2, 0.9], np.float32),
        edge_labels=np.array([1.0, 1.0], np.float32),
        node_entity_ids=np.array([10, 11, 12]),
        node_embedding_ids=np.array([1, 2, 3]),
        start_entity_ids=np.array([10]),
        answer_entity_ids=np.array([12]),
        start_node_locals=np.array([0]),
        answer_node_locals=np.array([2]),
        pair_start_local=np.array([0]),
        pair_answer_local=np.array([2]),
        pair_shortest_len=np.array([2]),
        is_answer_reachable=True,
        is_dummy_agent=False,
    )


def test_triplet_records_and_llm_runner(tmp_path):
    sample = _agent_sample()
    recs = build_triplet_records(
        sample,
        question_text="what is connected to A?",
        gold_answers=["C"],
        id2entity={10: "A", 11: "B", 12: "C"},
        id2relation={0: "r0", 1: "r1"},
        settings=ReasonerSettings(window_k=(1, 2)),
    )
    assert len(recs) == 2
    # Ranked by score desc: edge 1 first.
    assert recs[0]["retrieved_edge_ids"] == [1]
    assert recs[0]["hit_set"] is True  # both edges are DAG edges
    assert "Triplets:" in recs[0]["prompt"] and "(B, r1, C)" in recs[0]["prompt"]

    llm = init_llm(LLMConfig(model_name="mock", backend="mock", mock_response='{"answers": ["C"]}'))
    out_path = tmp_path / "preds.jsonl"
    metrics = run_reasoner(recs, mode="llm", llm=llm, output_path=out_path)
    assert metrics["results/hit"] == 1.0
    lines = out_path.read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0])["prediction"] == '{"answers": ["C"]}'
    assert (tmp_path / "preds.jsonl.metrics.json").exists()


def test_oracle_runner():
    metrics = run_reasoner(
        [],
        mode="oracle",
        oracle_inputs=[
            {
                "head_entity_ids": np.array([10, 11]),
                "tail_entity_ids": np.array([11, 12]),
                "answer_entity_ids": np.array([12]),
            }
        ],
        k_values=[1, 2],
    )
    assert metrics["answer_hit@2"] == 1.0 and metrics["answer_hit@1"] == 0.0


def test_ollama_request_contract(monkeypatch):
    """The ollama backend sends the reference's exact wire format
    (``src/utils/llm_client.py:41-59``): POST /api/chat, JSON payload with
    model (ollama: prefix stripped), messages, stream=false, and
    temperature/num_predict/frequency_penalty under options."""
    import io
    import json as _json

    import evi_rag_tpu.eval.llm_client as mod

    captured = {}

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        captured["url"] = req.full_url
        captured["method"] = req.get_method()
        captured["payload"] = _json.loads(req.data.decode())
        captured["timeout"] = timeout
        return _Resp(_json.dumps({"message": {"content": "hi"}}).encode())

    monkeypatch.setattr(mod.request, "urlopen", fake_urlopen)
    chat = init_llm(LLMConfig(
        backend="ollama", model_name="ollama:llama3", temperature=0.25,
        max_tokens=77, frequency_penalty=0.5,
    ))
    msgs = [{"role": "user", "content": "q"}]
    assert chat(msgs) == "hi"
    assert captured["url"].endswith("/api/chat")
    assert captured["method"] == "POST"
    assert captured["payload"] == {
        "model": "llama3",
        "messages": msgs,
        "stream": False,
        "options": {"temperature": 0.25, "num_predict": 77, "frequency_penalty": 0.5},
    }

    # Missing message.content is a hard error, as in the reference.
    monkeypatch.setattr(
        mod.request, "urlopen",
        lambda req, timeout=None: _Resp(_json.dumps({"done": True}).encode()),
    )
    with pytest.raises(ValueError, match="message.content"):
        chat(msgs)


def test_llm_retry_backoff(monkeypatch):
    calls = []

    def flaky(messages):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    import evi_rag_tpu.eval.llm_client as mod

    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    assert run_chat(flaky, [], max_retries=3) == "ok"
    assert len(calls) == 3


def test_path_records_shortest_hit():
    from evi_rag_tpu.eval.reasoner import build_path_records, chain_is_shortest_hit

    chain = {
        "chain_text": "A --[r0]--> B --[r1]--> C",
        "frequency": 2,
        "length": 2,
        "edge_local_ids": [0, 1],
        "chain_edges": [
            {"src_node_local": 0, "dst_node_local": 1, "relation_id": 0, "direction": 0,
             "edge_id": 0, "head_entity_id": 10, "tail_entity_id": 11,
             "src_entity_id": 10, "dst_entity_id": 11},
            {"src_node_local": 1, "dst_node_local": 2, "relation_id": 1, "direction": 0,
             "edge_id": 1, "head_entity_id": 11, "tail_entity_id": 12,
             "src_entity_id": 11, "dst_entity_id": 12},
        ],
    }
    assert chain_is_shortest_hit(
        chain, pair_start_local=[0], pair_answer_local=[2], pair_shortest_len=[2]
    )
    assert not chain_is_shortest_hit(
        chain, pair_start_local=[0], pair_answer_local=[2], pair_shortest_len=[1]
    )
    rec = build_path_records(
        sample_id="s0", question_text="q?", gold_answers=["C"], chains=[chain],
        settings=ReasonerSettings(path_limit=5),
        pair_start_local=[0], pair_answer_local=[2], pair_shortest_len=[2],
    )
    assert rec["hit_set"] is True and rec["visible_edge_ids"] == [0, 1]
    assert "Paths:" in rec["prompt"]
