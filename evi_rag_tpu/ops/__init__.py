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
from evi_rag_tpu.ops.knn import knn_topk, knn_topk_sharded
from evi_rag_tpu.ops.query import (
    TripleIndex,
    build_triple_index,
    query_topk,
    query_topk_per_question,
    query_topk_sharded,
    query_topk_sharded_fused,
)

__all__ = [
    "NEG_INF",
    "GraphBatch",
    "TripleIndex",
    "build_triple_index",
    "knn_topk",
    "knn_topk_sharded",
    "query_topk",
    "query_topk_per_question",
    "query_topk_sharded",
    "query_topk_sharded_fused",
    "segment_argmax",
    "segment_count",
    "segment_logsumexp",
    "segment_max",
    "segment_mean",
    "segment_min",
    "segment_softmax",
    "segment_sum",
]
