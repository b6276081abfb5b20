"""Legacy concat-mode scorer components (checkpoint-compat surface).

The reference keeps a "concat-mode" retriever head loadable by the GFlowNet
embedder (``src/models/components/heads.py``, ``fusion.py``; embedder path
``gflownet_embedder.py:442-487``).  These Flax equivalents preserve that
capability: a dense feature extractor over the concatenated
[query ‖ head ‖ relation ‖ tail (‖ struct)] token, FiLM or concat fusion of
semantic and structural features, and a single-logit head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class DenseFeatureExtractor(nn.Module):
    """Two-layer MLP with dropout (reference ``heads.py:8-36``)."""

    emb_dim: int
    hidden_dim: int
    dropout_p: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.gelu(nn.Dense(self.emb_dim, name="dense_0")(x))
        x = nn.Dropout(self.dropout_p)(x, deterministic=not train)
        x = nn.gelu(nn.Dense(self.hidden_dim, name="dense_1")(x))
        x = nn.Dropout(self.dropout_p)(x, deterministic=not train)
        return x


class DeterministicHead(nn.Module):
    """Single-logit scorer (reference ``heads.py:39-47``)."""

    @nn.compact
    def __call__(self, features: jax.Array) -> jax.Array:
        return nn.Dense(1, name="linear")(features)[..., 0]


class FiLMLayer(nn.Module):
    """Feature-wise linear modulation (reference ``fusion.py:7-18``)."""

    feature_dim: int

    @nn.compact
    def __call__(self, features: jax.Array, conditioning: jax.Array) -> jax.Array:
        gb = nn.Dense(self.feature_dim * 2, name="param_generator")(conditioning)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return (gamma + 1.0) * features + beta


class FeatureFusion(nn.Module):
    """Concat or FiLM fusion of semantic + structural features
    (reference ``fusion.py:21-44``)."""

    fusion_method: str  # concat | film
    semantic_dim: int
    structure_dim: int

    @property
    def output_dim(self) -> int:
        return self.semantic_dim if self.fusion_method == "film" else self.semantic_dim + self.structure_dim

    @nn.compact
    def __call__(self, semantic: jax.Array, structure: jax.Array) -> jax.Array:
        if self.fusion_method == "concat":
            return jnp.concatenate([semantic, structure], axis=-1)
        if self.fusion_method == "film":
            return FiLMLayer(self.semantic_dim, name="film")(semantic, structure)
        raise ValueError(f"unknown fusion method {self.fusion_method!r}")
