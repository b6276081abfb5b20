"""Retriever training objective: multi-positive grouped InfoNCE (+ optional BCE).

Re-derivation of the reference ``RetrieverLoss`` (``src/losses/
retriever_loss.py:28-299``) over the padded edge axis.  Per graph g:

    L_g = logsumexp_{e in g}(s_e) - logsumexp_{e in g, y_e=1}(s_e)

with scores ``s = logits / T + log(edge_weight)``; graphs without both a
positive and a negative edge are excluded from the mean
(``retriever_loss.py:126-136``).  Path supervision is forbidden by design --
the retriever is triple-only (``retriever_loss.py:44-50``).

All reductions are segment ops; the padding graph absorbs padding edges so no
explicit edge mask is needed for the grouped terms, but ``graph_mask`` gates
the final mean.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from evi_rag_tpu.ops.segment import segment_logsumexp, segment_sum

POS_LABEL_THRESHOLD = 0.5
_MIN_EDGE_WEIGHT = 1e-6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LossOutput:
    loss: jax.Array
    components: dict[str, jax.Array]
    metrics: dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class RetrieverLossConfig:
    infonce_temperature: float = 1.0
    infonce_weight: float = 1.0
    bce_weight: float = 0.0
    edge_weight_near: float = 1.0
    edge_weight_bridge: float = 1.0

    def __post_init__(self) -> None:
        if self.infonce_temperature <= 0:
            raise ValueError("infonce_temperature must be positive")
        if self.infonce_weight < 0 or self.bce_weight < 0:
            raise ValueError("loss weights must be non-negative")
        if self.infonce_weight == 0 and self.bce_weight == 0:
            raise ValueError("at least one non-zero loss weight required")
        if self.edge_weight_near <= 0 or self.edge_weight_bridge <= 0:
            raise ValueError("edge weights must be positive")

    @property
    def requires_edge_is_near(self) -> bool:
        return self.edge_weight_near != 1.0 or self.edge_weight_bridge != 1.0


def retriever_loss(
    logits: jax.Array,       # [E]
    labels: jax.Array,       # [E] float
    edge_batch: jax.Array,   # [E] int32
    *,
    num_graphs: int,
    graph_mask: jax.Array,   # [G] bool
    edge_mask: jax.Array,    # [E] bool
    config: RetrieverLossConfig,
    edge_is_near: jax.Array | None = None,
) -> LossOutput:
    labels = labels.astype(jnp.float32)
    pos_mask = (labels > POS_LABEL_THRESHOLD) & edge_mask
    neg_mask = (labels <= POS_LABEL_THRESHOLD) & edge_mask

    scores = logits.astype(jnp.float32) / config.infonce_temperature
    if config.requires_edge_is_near:
        if edge_is_near is None:
            raise ValueError("edge_is_near required when edge weights are enabled")
        w = jnp.where(edge_is_near, config.edge_weight_near, config.edge_weight_bridge)
        scores = scores + jnp.log(jnp.maximum(w, _MIN_EDGE_WEIGHT))
    else:
        w = None

    lse_all = segment_logsumexp(scores, edge_batch, num_graphs, mask=edge_mask)
    lse_pos = segment_logsumexp(scores, edge_batch, num_graphs, mask=pos_mask)

    pos_counts = segment_sum(pos_mask.astype(jnp.float32), edge_batch, num_graphs)
    neg_counts = segment_sum(neg_mask.astype(jnp.float32), edge_batch, num_graphs)
    valid = (pos_counts > 0) & (neg_counts > 0) & graph_mask

    per_graph = jnp.where(valid, lse_all - lse_pos, 0.0)
    n_valid = jnp.sum(valid.astype(jnp.float32))
    infonce = jnp.sum(per_graph) / jnp.maximum(n_valid, 1.0)
    # Degenerate batch (no graph with both pos+neg) => zero loss, matching
    # reference early-outs (retriever_loss.py:85-90, 127-134).
    infonce = jnp.where(n_valid > 0, infonce, 0.0)

    bce = jnp.zeros(())
    if config.bce_weight > 0:
        per_edge = _bce_with_logits(logits.astype(jnp.float32), labels)
        if w is not None:
            per_edge = per_edge * w
            denom = segment_sum(w, edge_batch, num_graphs, mask=edge_mask)
        else:
            denom = segment_sum(edge_mask.astype(jnp.float32), edge_batch, num_graphs)
        loss_sum = segment_sum(per_edge, edge_batch, num_graphs, mask=edge_mask)
        g_valid = (denom > 0) & graph_mask
        per_g = jnp.where(g_valid, loss_sum / jnp.maximum(denom, _MIN_EDGE_WEIGHT), 0.0)
        nb = jnp.maximum(jnp.sum(g_valid.astype(jnp.float32)), 1.0)
        bce = jnp.sum(per_g) / nb

    total = config.infonce_weight * infonce + config.bce_weight * bce

    probs = jax.nn.sigmoid(logits)
    pos_avg = jnp.sum(jnp.where(pos_mask, probs, 0.0)) / jnp.maximum(jnp.sum(pos_mask), 1)
    neg_avg = jnp.sum(jnp.where(neg_mask, probs, 0.0)) / jnp.maximum(jnp.sum(neg_mask), 1)

    return LossOutput(
        loss=total,
        components={"infonce": infonce, "bce": bce},
        metrics={
            "pos_prob": pos_avg,
            "neg_prob": neg_avg,
            "separation": pos_avg - neg_avg,
            "infonce_graphs": n_valid,
            "infonce_pos_edges": jnp.sum(pos_mask.astype(jnp.float32)),
            "infonce_neg_edges": jnp.sum(neg_mask.astype(jnp.float32)),
        },
    )


def _bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Stable elementwise binary cross-entropy with logits."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
