"""Parameter-dict neural-net primitives shared by the frozen-feature paths.

Apply functions over plain parameter dicts (flax layouts) used wherever
frozen retriever weights ride along as arrays rather than live modules: the
GFlowNet embedder, the query engine, and the Pallas kernel weight prep.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def dense(p: Any, x: jax.Array) -> jax.Array:
    return x @ p["kernel"] + p["bias"]


def projector(p: Any, x: jax.Array) -> jax.Array:
    """EmbeddingProjector: Linear + tanh (models/retriever.py)."""
    return jnp.tanh(dense(p["proj"], x))


def layernorm(p: Any, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
