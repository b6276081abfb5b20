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


def dense_split(p: Any, parts: tuple[jax.Array, ...], dtype: Any) -> jax.Array:
    """``dense`` over a conceptual concat input, applied per kernel
    row-slice with f32 accumulation and one rounding at the end.

    Must mirror ``models/retriever.py::SplitInputDense`` exactly: the train
    path computes state_net_0 this way, and on the MXU a single wide f32
    contraction differs from the per-piece form at ~1e-3 (f32 matmuls lower
    to bf16x3 passes whose error depends on the contraction grouping) — a
    formulation mismatch between train and serve would break their score
    parity at tolerances the tests (and users) rely on.  ``dtype`` is the
    compute dtype EVERY part and kernel slice is cast to (SplitInputDense's
    ``self.dtype``); parts may arrive mixed (f32 nav-gated products next to
    bf16 geometry) and per-part dtypes would silently diverge from training.
    """
    acc = p["bias"].astype(jnp.float32)
    off = 0
    kernel = p["kernel"]
    for x in parts:
        d = x.shape[-1]
        k = kernel[off : off + d].astype(dtype)
        x = x.astype(dtype)
        acc = acc + jax.lax.dot_general(
            x, k, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        off += d
    if off != kernel.shape[0]:
        raise ValueError(f"parts sum to {off} rows, kernel has {kernel.shape[0]}")
    return acc.astype(dtype)


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
