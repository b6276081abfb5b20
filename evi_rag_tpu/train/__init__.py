"""Training: optimizers, train states, loops, checkpointing."""

from evi_rag_tpu.train.checkpoint import (
    export_retriever_features,
    load_checkpoint,
    save_checkpoint,
    validate_parity_meta,
)
from evi_rag_tpu.train.optim import OptimizerConfig, ParamGroup, muon, setup_optimizer

__all__ = [
    "OptimizerConfig",
    "ParamGroup",
    "export_retriever_features",
    "load_checkpoint",
    "muon",
    "save_checkpoint",
    "setup_optimizer",
    "validate_parity_meta",
]
