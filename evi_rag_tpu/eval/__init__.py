"""Evaluation: ranking metrics, reachability, artifact pipeline, reasoner."""

from evi_rag_tpu.eval.llm_metrics import evaluate_predictions
from evi_rag_tpu.eval.metrics import (
    MetricAccumulator,
    answer_reachability_at_k,
    edge_recall_at_k,
)
from evi_rag_tpu.eval.oracle import oracle_metrics_for_sample
from evi_rag_tpu.eval.ranking import (
    FeatureMonitor,
    RankingStats,
    compute_answer_hit,
    compute_answer_recall,
    compute_ranking_metrics,
)

__all__ = [
    "FeatureMonitor",
    "MetricAccumulator",
    "RankingStats",
    "answer_reachability_at_k",
    "compute_answer_hit",
    "compute_answer_recall",
    "compute_ranking_metrics",
    "edge_recall_at_k",
    "evaluate_predictions",
    "oracle_metrics_for_sample",
]
