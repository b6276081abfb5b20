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


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU -- the reference uses ``nn.GELU()`` (erf form,
    e.g. ``src/models/components/retriever.py:163,178``); jax's default is
    the tanh approximation, which differs by ~1e-3 and would break strict
    differential parity with the reference math."""
    return jax.nn.gelu(x, approximate=False)


def projector(p: Any, x: jax.Array) -> jax.Array:
    """EmbeddingProjector: Linear + tanh (models/retriever.py)."""
    return jnp.tanh(dense(p["proj"], x))


def layernorm(p: Any, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    # eps matches torch nn.LayerNorm (the reference layer, default 1e-5).
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
