"""Offline ranking metric suite: P/R/F1/nDCG@k, MRR, answer recall/hit@k,
FeatureMonitor (reference ``src/utils/metrics.py:112-238``,
``src/metrics/feature_monitor.py``)."""

import numpy as np
import pytest

from evi_rag_tpu.eval.ranking import (
    FeatureMonitor,
    compute_answer_hit,
    compute_answer_recall,
    compute_ranking_metrics,
    normalize_k_values,
)


def test_normalize_k_values():
    assert normalize_k_values([5, 1, 5, 0, -2]) == (1, 5)
    assert normalize_k_values(None, default=[3]) == (3,)
    assert normalize_k_values([]) == ()


def test_ranking_metrics_hand_computed():
    # One sample: scores rank edges as [e2, e0, e3, e1]; labels: e0, e1 pos.
    sample = {
        "scores": np.array([3.0, 1.0, 4.0, 2.0]),
        "labels": np.array([1.0, 1.0, 0.0, 0.0]),
    }
    stats = compute_ranking_metrics([sample], k_values=[1, 2, 4])
    # ranked labels = [0, 1, 0, 1]
    assert stats.precision_at_k[1] == 0.0
    assert stats.recall_at_k[1] == 0.0
    assert stats.precision_at_k[2] == pytest.approx(0.5)
    assert stats.recall_at_k[2] == pytest.approx(0.5)
    assert stats.f1_at_k[2] == pytest.approx(0.5)
    assert stats.precision_at_k[4] == pytest.approx(0.5)
    assert stats.recall_at_k[4] == pytest.approx(1.0)
    assert stats.f1_at_k[4] == pytest.approx(2 / 3)
    assert stats.mrr == pytest.approx(0.5)  # first positive at rank 2
    # nDCG@4: dcg = 1/log2(3) + 1/log2(5); ideal = 1/log2(2) + 1/log2(3)
    dcg = 1 / np.log2(3) + 1 / np.log2(5)
    ideal = 1.0 + 1 / np.log2(3)
    assert stats.ndcg_at_k[4] == pytest.approx(dcg / ideal)


def test_ranking_metrics_skips_no_positive_and_averages():
    perfect = {"scores": np.array([2.0, 1.0]), "labels": np.array([1.0, 0.0])}
    empty = {"scores": np.array([2.0, 1.0]), "labels": np.array([0.0, 0.0])}
    worst = {"scores": np.array([1.0, 2.0]), "labels": np.array([1.0, 0.0])}
    stats = compute_ranking_metrics([perfect, empty, worst], k_values=[1])
    # `empty` is skipped entirely.
    assert stats.precision_at_k[1] == pytest.approx(0.5)
    assert stats.mrr == pytest.approx((1.0 + 0.5) / 2)
    assert stats.ndcg_at_k[1] == pytest.approx(0.5)


def test_ranking_metrics_bounds_fuzz(rng):
    samples = [
        {
            "scores": rng.normal(size=20),
            "labels": (rng.random(20) < 0.3).astype(np.float64),
        }
        for _ in range(16)
    ]
    stats = compute_ranking_metrics(samples, k_values=[1, 3, 10, 20])
    for d in (stats.precision_at_k, stats.recall_at_k, stats.f1_at_k, stats.ndcg_at_k):
        for v in d.values():
            assert 0.0 <= v <= 1.0
    assert 0.0 <= stats.mrr <= 1.0
    # recall is monotone in k
    assert stats.recall_at_k[1] <= stats.recall_at_k[3] <= stats.recall_at_k[20]
    flat = stats.as_flat_dict("ranking/")
    assert "ranking/ndcg@10" in flat and "ranking/mrr" in flat


def test_answer_recall_and_hit():
    # Edges (head, tail): e0=(7,8) e1=(1,9) e2=(2,3); answers {8, 9}.
    sample = {
        "scores": np.array([3.0, 2.0, 1.0]),  # rank: e0, e1, e2
        "head_ids": np.array([7, 1, 2]),
        "tail_ids": np.array([8, 9, 3]),
        "answer_ids": np.array([8, 9]),
    }
    rec = compute_answer_recall([sample], [1, 2, 3])
    assert rec["answer_recall@1"] == pytest.approx(0.5)  # only 8 found
    assert rec["answer_recall@2"] == pytest.approx(1.0)
    hit = compute_answer_hit([sample], [1, 2, 3])
    assert hit["answer_hit@1"] == 1.0
    assert hit["answer_hit@3"] == 1.0
    # No answers => sample skipped; empty => 0.0 averages.
    none = dict(sample, answer_ids=np.array([], dtype=np.int64))
    assert compute_answer_hit([none], [1]) == {"answer_hit@1": 0.0}


def test_feature_monitor():
    fm = FeatureMonitor()
    logits = np.array([2.0, -2.0, 0.0, 4.0])
    labels = np.array([1.0, 0.0, 0.0, 1.0])
    feats = np.ones((4, 4))  # norm 2 each
    fm.update(logits, labels, features=feats)
    out = fm.compute()
    sig = lambda x: 1 / (1 + np.exp(-x))
    assert out["features/pos_prob_avg"] == pytest.approx((sig(2) + sig(4)) / 2)
    assert out["features/neg_prob_avg"] == pytest.approx((sig(-2) + sig(0)) / 2)
    assert out["features/separation_gap"] == pytest.approx(
        out["features/pos_prob_avg"] - out["features/neg_prob_avg"]
    )
    assert out["features/norm_avg"] == pytest.approx(2.0)
    # Masked update ignores padding slots.
    fm2 = FeatureMonitor()
    fm2.update(logits, labels, features=feats, mask=np.array([True, True, False, False]))
    out2 = fm2.compute()
    assert out2["features/pos_prob_avg"] == pytest.approx(sig(2))
    assert out2["features/neg_prob_avg"] == pytest.approx(sig(-2))
