"""Evaluation: ranking metrics, reachability, artifact pipeline, reasoner."""

from evi_rag_tpu.eval.llm_metrics import evaluate_predictions
from evi_rag_tpu.eval.metrics import (
    MetricAccumulator,
    answer_reachability_at_k,
    edge_recall_at_k,
)
from evi_rag_tpu.eval.oracle import oracle_metrics_for_sample

__all__ = [
    "MetricAccumulator",
    "answer_reachability_at_k",
    "edge_recall_at_k",
    "evaluate_predictions",
    "oracle_metrics_for_sample",
]
