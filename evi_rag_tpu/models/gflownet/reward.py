"""Terminal reward for sampled evidence-edge sets.

Re-derivation of the reference ``GFlowNetReward`` (``src/models/components/
gflownet_rewards.py:26-213``):

    log R = log(success_reward) + semantic_coef * mean(sigmoid(score_e) over
            selected edges) - length_coef * max(0, path_len - shortest_len)
    on answer hit; log(failure_reward) otherwise; -inf for dummy graphs.

The per-(start,answer) shortest length is matched from the padded pair
supervision by exact (start_hit, answer_hit) local-id equality with a
segment-min over matching pairs -- the reference does this with bucketize +
torch_scatter ``scatter_min`` (``gflownet_rewards.py:158-213``); here pairs
are already graph-tagged so it is a single masked segment_min.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from evi_rag_tpu.models.batches import AgentBatch
from evi_rag_tpu.ops.segment import segment_min, segment_sum


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RewardOutput:
    reward: jax.Array
    log_reward: jax.Array
    success: jax.Array
    semantic_score: jax.Array
    length_cost: jax.Array
    path_len: jax.Array
    shortest_len: jax.Array


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    success_reward: float = 1.0
    failure_reward: float = 1e-4
    semantic_coef: float = 1.0
    length_coef: float = 1.0

    def __post_init__(self) -> None:
        if self.success_reward <= 0 or self.failure_reward <= 0:
            raise ValueError("rewards must be positive")
        if self.success_reward <= self.failure_reward:
            raise ValueError("success_reward must exceed failure_reward")
        if self.semantic_coef < 0 or self.length_coef < 0:
            raise ValueError("coefficients must be >= 0")


def match_shortest_lengths(
    batch: AgentBatch,
    start_node_hit: jax.Array,   # [G] graph-local
    answer_node_hit: jax.Array,  # [G] graph-local
) -> jax.Array:
    """Shortest BFS length for the realized (start, answer) pair; -1 if unknown."""
    p = batch.pairs
    g = batch.graph.num_graphs
    pb = p.pair_batch
    match = (
        p.pair_mask
        & (p.pair_start_local == start_node_hit[pb])
        & (p.pair_answer_local == answer_node_hit[pb])
    )
    big = 1 << 30
    shortest = segment_min(
        jnp.where(match, p.pair_shortest_len, big).astype(jnp.int32), pb, g, fill=big
    )
    return jnp.where(shortest >= big, -1, shortest)


def compute_reward(
    batch: AgentBatch,
    *,
    selected_mask: jax.Array,   # [E] bool
    answer_hit: jax.Array,      # [G] bool
    start_node_hit: jax.Array,  # [G]
    answer_node_hit: jax.Array,  # [G]
    config: RewardConfig,
) -> RewardOutput:
    gb = batch.graph
    g = gb.num_graphs
    sel = (selected_mask & gb.edge_mask).astype(jnp.float32)
    path_len = segment_sum(sel, gb.edge_batch, g)

    weights = jax.nn.sigmoid(batch.edge_scores.astype(jnp.float32))
    semantic_sum = segment_sum(sel * weights, gb.edge_batch, g)
    semantic = semantic_sum / jnp.maximum(path_len, 1.0)

    shortest = match_shortest_lengths(batch, start_node_hit, answer_node_hit)
    hit = answer_hit.astype(bool)
    have_shortest = shortest >= 0
    length_cost = jnp.where(
        hit & have_shortest,
        jnp.maximum(path_len - shortest.astype(jnp.float32), 0.0),
        0.0,
    )
    semantic = jnp.where(hit, semantic, 0.0)

    log_r = jnp.where(
        hit,
        math.log(config.success_reward)
        + config.semantic_coef * semantic
        - config.length_coef * length_cost,
        jnp.full((g,), math.log(config.failure_reward), dtype=jnp.float32),
    )
    dummy = batch.is_dummy | (~gb.graph_mask)
    log_r = jnp.where(dummy, -jnp.inf, log_r)
    reward = jnp.where(dummy, 0.0, jnp.exp(log_r))
    return RewardOutput(
        reward=reward,
        log_reward=log_r,
        success=jnp.where(dummy, 0.0, hit.astype(jnp.float32)),
        semantic_score=jnp.where(dummy, 0.0, semantic),
        length_cost=jnp.where(dummy, 0.0, length_cost),
        path_len=jnp.where(dummy, 0.0, path_len),
        shortest_len=jnp.where(dummy, -1, shortest).astype(jnp.float32),
    )
