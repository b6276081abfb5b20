"""Core device-side building blocks: segment ops, padded graph batches, kernels."""

from evi_rag_tpu.ops.segment import (
    NEG_INF,
    segment_argmax,
    segment_count,
    segment_logsumexp,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)
from evi_rag_tpu.ops.graph import GraphBatch

__all__ = [
    "NEG_INF",
    "GraphBatch",
    "segment_argmax",
    "segment_count",
    "segment_logsumexp",
    "segment_max",
    "segment_mean",
    "segment_min",
    "segment_softmax",
    "segment_sum",
]
