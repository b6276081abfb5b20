"""Model families: retriever (triple scorer), GFlowNet path sampler, reasoner."""

from evi_rag_tpu.models.batches import AgentBatch, PairSupervision, RetrieverBatch
from evi_rag_tpu.models.losses import LossOutput, RetrieverLossConfig, retriever_loss
from evi_rag_tpu.models.retriever import Retriever, RetrieverOutput

__all__ = [
    "AgentBatch",
    "LossOutput",
    "PairSupervision",
    "Retriever",
    "RetrieverBatch",
    "RetrieverLossConfig",
    "RetrieverOutput",
    "retriever_loss",
]
