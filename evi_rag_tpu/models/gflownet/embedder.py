"""Frozen-retriever feature embedder for the GFlowNet.

Re-design of the reference ``GraphEmbedder`` (``src/models/components/
gflownet_embedder.py:35-1154``).  The reference reconstructs the retriever's
feature geometry by reading raw state-dict tensors by key prefix
(``:313-533``); here the retriever checkpoint exports a *typed feature
bundle* (``train/checkpoint.py::export_retriever_features``) and this module
applies it as pure functions:

* node tokens   = entity_proj(entity text emb) with the learned non-text
  override (``gflownet_embedder.py:1070-1088``);
* question tok. = query_proj(question emb);
* edge tokens   = mean over (fwd, bwd) of the retriever's state_net features
  -- DistMult*nav_gate ‖ struct_ctx ‖ TransE error ‖ dist -- over structural
  features rebuilt from start nodes + DDE with parity_meta rounds
  (``:873-914, 1035-1068``), plus a zero-init trainable
  ``edge_score_proj(score)`` bonus (``:248-256``).

Everything is dense matmul/elementwise work over the padded axes; the frozen
bundle rides along as ordinary arrays (no parameter surgery).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from evi_rag_tpu.models.batches import AgentBatch
from evi_rag_tpu.models.dde import build_node_struct_features
from evi_rag_tpu.ops.nnfn import dense as _dense, dense_split as _dense_split, layernorm as _layernorm, projector as _projector
from evi_rag_tpu.ops.nnfn import gelu_exact as _gelu_exact


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmbedOutputs:
    edge_tokens: jax.Array      # [E, H]
    node_tokens: jax.Array      # [N, H]
    question_tokens: jax.Array  # [G, H]


def _geometry_features(
    feats: Any,
    *,
    q_edge: jax.Array,
    head_edge: jax.Array,
    relation_edge: jax.Array,
    tail_edge: jax.Array,
    struct_edge: jax.Array,
) -> jax.Array:
    """The retriever's pre-score-head feature stack (retriever.py:453-484)."""
    r_ctx = relation_edge * jax.nn.sigmoid(_dense(feats["q_gate"], q_edge)) + jnp.tanh(
        _dense(feats["q_bias"], q_edge)
    )
    struct_ctx = _gelu_exact(_layernorm(feats["struct_norm"], _dense(feats["struct_proj"], struct_edge)))
    nav_gate = jax.nn.sigmoid(_dense(feats["struct_gate"], struct_ctx))
    interaction = head_edge * r_ctx * tail_edge * nav_gate
    error_vec = head_edge + r_ctx - tail_edge
    dist = -jnp.sqrt(jnp.sum(error_vec * error_vec, axis=-1, keepdims=True) + 1e-12)
    # combined = concat([interaction, struct_ctx, error_vec, dist]); split
    # form matches the retriever train path (SplitInputDense) on the MXU.
    h = _gelu_exact(_layernorm(
        feats["state_norm"],
        _dense_split(
            feats["state_net_0"],
            (interaction, struct_ctx, error_vec, dist),
            jnp.float32,  # frozen-feature path is f32 (reference embedder)
        ),
    ))
    return _dense(feats["state_net_1"], h)


def _adapter_features(
    adapter: Any,
    *,
    q_edge: jax.Array,
    head_edge: jax.Array,
    relation_edge: jax.Array,
    tail_edge: jax.Array,
    struct_edge: jax.Array,
) -> jax.Array:
    """Legacy concat-mode edge adapter: Linear -> LN -> GELU -> Linear over
    [q ‖ h ‖ r ‖ t ‖ struct], applied as split matmuls without materializing
    the 4H(+S) concat (the reference's split-weight trick,
    ``gflownet_embedder.py:934-1033``)."""
    w = adapter["dense_0"]["kernel"]
    h = q_edge.shape[-1]
    s = struct_edge.shape[-1]
    if w.shape[0] != 4 * h + s:
        raise ValueError(
            f"edge_adapter in_dim {w.shape[0]} != 4*{h}+{s} (semantic + struct)"
        )
    z = (
        q_edge @ w[:h]
        + head_edge @ w[h : 2 * h]
        + relation_edge @ w[2 * h : 3 * h]
        + tail_edge @ w[3 * h : 4 * h]
        + struct_edge @ w[4 * h :]
        + adapter["dense_0"]["bias"]
    )
    z = _gelu_exact(_layernorm(adapter["norm"], z))
    return _dense(adapter["dense_1"], z)


def embed_agent_batch_frozen(bundle: dict[str, Any], batch: AgentBatch) -> EmbedOutputs:
    """The parameter-free part of the embedding: (edge, node, question)
    tokens from the frozen retriever bundle, WITHOUT the trainable
    edge-score bonus.  Depends only on (bundle, batch), so callers may
    compute it once per batch and reuse it across train steps/epochs
    (the reference recomputes this every step, ``gflownet_module.py:393``).
    """
    feats = bundle["features"]
    parity = bundle["parity_meta"]
    gb = batch.graph

    question_tokens = _projector(feats["query_proj"], batch.question_emb)
    node_tokens = _projector(feats["entity_proj"], batch.node_emb)
    non_text = _projector(feats["entity_proj"], feats["non_text_entity_emb"][None, :])[0]
    node_tokens = jnp.where(batch.node_is_nontext[:, None], non_text[None, :], node_tokens)
    relation_tokens = _projector(feats["relation_proj"], batch.edge_emb)

    # Structural features from start nodes + DDE with the parity contract.
    one = batch.node_is_start.astype(jnp.float32)
    topic_one_hot = jnp.stack([1.0 - one, one], axis=-1)
    if int(parity["num_topics"]) != 2:
        raise ValueError("parity_meta.num_topics must be 2")
    node_struct = build_node_struct_features(
        topic_one_hot,
        gb.edge_index,
        num_rounds=int(parity["dde_rounds"]),
        num_reverse_rounds=int(parity["dde_reverse_rounds"]),
        edge_mask=gb.edge_mask,
    )
    heads, tails = gb.heads, gb.tails
    struct_fwd = jnp.concatenate([node_struct[heads], node_struct[tails]], axis=-1)
    struct_bwd = jnp.concatenate([node_struct[tails], node_struct[heads]], axis=-1)

    q_edge = question_tokens[gb.edge_batch]
    head_edge = node_tokens[heads]
    tail_edge = node_tokens[tails]
    edge_mode = bundle.get("edge_mode", "geometry")
    if edge_mode == "concat":
        # Legacy concat-mode checkpoints (reference embedder path :442-487).
        adapter = feats["edge_adapter"]
        fwd = _adapter_features(
            adapter, q_edge=q_edge, head_edge=head_edge, relation_edge=relation_tokens,
            tail_edge=tail_edge, struct_edge=struct_fwd,
        )
        bwd = _adapter_features(
            adapter, q_edge=q_edge, head_edge=tail_edge, relation_edge=relation_tokens,
            tail_edge=head_edge, struct_edge=struct_bwd,
        )
    elif edge_mode == "geometry":
        fwd = _geometry_features(
            feats, q_edge=q_edge, head_edge=head_edge, relation_edge=relation_tokens,
            tail_edge=tail_edge, struct_edge=struct_fwd,
        )
        bwd = _geometry_features(
            feats, q_edge=q_edge, head_edge=tail_edge, relation_edge=relation_tokens,
            tail_edge=head_edge, struct_edge=struct_bwd,
        )
    else:
        raise ValueError(f"unknown edge_mode {edge_mode!r}")
    edge_tokens = 0.5 * (fwd + bwd)
    return EmbedOutputs(
        edge_tokens=edge_tokens,
        node_tokens=node_tokens,
        question_tokens=question_tokens,
    )


def apply_score_bonus(
    embed: EmbedOutputs,
    batch: AgentBatch,
    edge_score_proj: dict[str, jax.Array],
) -> EmbedOutputs:
    """Add the trainable zero-init Linear(1,H) retriever-score bonus to the
    edge tokens (reference ``gflownet_embedder.py:248-256``)."""
    score_in = batch.edge_scores.astype(embed.edge_tokens.dtype)[:, None]
    return EmbedOutputs(
        edge_tokens=embed.edge_tokens + _dense(edge_score_proj, score_in),
        node_tokens=embed.node_tokens,
        question_tokens=embed.question_tokens,
    )


def embed_agent_batch(
    bundle: dict[str, Any],
    batch: AgentBatch,
    *,
    edge_score_proj: dict[str, jax.Array],
) -> EmbedOutputs:
    """Frozen embedding + trainable edge-score bonus in one call."""
    return apply_score_bonus(
        embed_agent_batch_frozen(bundle, batch), batch, edge_score_proj
    )


def init_edge_score_proj(hidden_dim: int) -> dict[str, jax.Array]:
    """Zero-init Linear(1, H): the score bonus starts neutral
    (reference ``gflownet_embedder.py:248-256``)."""
    return {
        "kernel": jnp.zeros((1, hidden_dim), dtype=jnp.float32),
        "bias": jnp.zeros((hidden_dim,), dtype=jnp.float32),
    }
