"""GFlowNet state representation.

Re-design of the reference ``StateEncoder`` (``src/models/components/
state_encoder.py:21-241``): state = mean(active node tokens) + question +
remaining-step embedding + running action-history mean (+ optional state-DDE
structural mean), LayerNorm'd.  ``precompute`` hoists everything
step-invariant (node tokens, question tokens, optional DDE over the start
one-hot) out of the rollout loop; ``encode_state`` is a couple of masked
segment means per step.

Step embeddings are zero-initialized (``state_encoder.py:57-58``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from evi_rag_tpu.models.batches import AgentBatch
from evi_rag_tpu.models.dde import build_node_struct_features
from evi_rag_tpu.models.gflownet.env import EnvState
from evi_rag_tpu.ops.segment import segment_mean
from evi_rag_tpu.ops.nnfn import gelu_exact as _gelu_exact


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StateEncoderCache:
    question_tokens: jax.Array    # [G, H]
    node_tokens: jax.Array        # [N, H]
    node_struct_tokens: jax.Array  # [N, H] (zeros when state-DDE disabled)


class StateEncoder(nn.Module):
    hidden_dim: int
    max_steps: int
    use_state_dde: bool = False
    state_dde_rounds: int = 2
    state_dde_reverse_rounds: int = 2
    state_dde_num_topics: int = 2

    def setup(self) -> None:
        self.step_embeddings = nn.Embed(
            self.max_steps + 1,
            self.hidden_dim,
            embedding_init=nn.initializers.zeros,
            name="step_embeddings",
        )
        self.norm = nn.LayerNorm(name="norm", epsilon=1e-5)
        if self.use_state_dde:
            struct_dim = self.state_dde_num_topics * (
                1 + self.state_dde_rounds + self.state_dde_reverse_rounds
            )
            self._struct_dim = struct_dim
            self.state_dde_proj = nn.Dense(self.hidden_dim, name="state_dde_proj")

    def precompute(
        self,
        batch: AgentBatch,
        *,
        node_tokens: jax.Array,
        question_tokens: jax.Array,
    ) -> StateEncoderCache:
        struct_tokens = jnp.zeros_like(node_tokens)
        if self.use_state_dde:
            one = batch.node_is_start.astype(jnp.float32)
            topic_one_hot = jnp.stack([1.0 - one, one], axis=-1)
            if self.state_dde_num_topics != 2:
                raise ValueError("state_dde_num_topics must be 2")
            raw = build_node_struct_features(
                topic_one_hot,
                batch.graph.edge_index,
                num_rounds=self.state_dde_rounds,
                num_reverse_rounds=self.state_dde_reverse_rounds,
                edge_mask=batch.graph.edge_mask,
            )
            struct_tokens = self.state_dde_proj(raw)
        return StateEncoderCache(
            question_tokens=question_tokens,
            node_tokens=node_tokens,
            node_struct_tokens=struct_tokens,
        )

    def encode_state(
        self, cache: StateEncoderCache, state: EnvState, batch: AgentBatch
    ) -> jax.Array:
        gb = batch.graph
        g = gb.num_graphs
        active = state.active_nodes & gb.node_mask
        active_mean = segment_mean(cache.node_tokens, gb.node_batch, g, mask=active)
        remaining = jnp.clip(self.max_steps - state.step_counts, 0, self.max_steps)
        step_emb = self.step_embeddings(remaining)
        tokens = active_mean + cache.question_tokens + step_emb + state.action_hidden
        if self.use_state_dde:
            struct_mean = segment_mean(cache.node_struct_tokens, gb.node_batch, g, mask=active)
            tokens = tokens + struct_mean
        return self.norm(tokens)

    def encode_states_batched(
        self,
        cache: StateEncoderCache,
        batch: AgentBatch,
        *,
        active_seq: jax.Array,         # [T, N] bool pre-step frontiers
        counts_seq: jax.Array,         # [T, G] int32 pre-step step counts
        action_hidden_seq: jax.Array,  # [T, G, H] pre-step action-history means
    ) -> jax.Array:
        """All T per-step state tokens in one batched launch (the
        sample-then-score rollout's differentiable re-encode; same math as
        ``encode_state`` with the env-state snapshots stacked on a leading
        step axis)."""
        gb = batch.graph
        g = gb.num_graphs
        active = active_seq & gb.node_mask[None]
        mean_t = jax.vmap(
            lambda m: segment_mean(cache.node_tokens, gb.node_batch, g, mask=m)
        )(active)
        remaining = jnp.clip(self.max_steps - counts_seq, 0, self.max_steps)
        step_emb = self.step_embeddings(remaining)
        tokens = mean_t + cache.question_tokens[None] + step_emb + action_hidden_seq
        if self.use_state_dde:
            struct_t = jax.vmap(
                lambda m: segment_mean(cache.node_struct_tokens, gb.node_batch, g, mask=m)
            )(active)
            tokens = tokens + struct_t
        return self.norm(tokens)


class GFlowNetEstimator(nn.Module):
    """logF(s)/logZ head: MLP([state ‖ question]) -> scalar, zero-init last
    (reference ``gflownet_estimator.py:7-58``)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, state_emb: jax.Array, question_tokens: jax.Array) -> jax.Array:
        if question_tokens.ndim < state_emb.ndim:
            question_tokens = jnp.broadcast_to(
                jnp.expand_dims(question_tokens, axis=tuple(range(1, state_emb.ndim - 1))),
                state_emb.shape,
            )
        ctx = jnp.concatenate([state_emb, question_tokens], axis=-1)
        h = nn.LayerNorm(name="ctx_norm", epsilon=1e-5)(ctx)
        h = _gelu_exact(nn.Dense(self.hidden_dim, name="dense_0")(h))
        out = nn.Dense(1, name="dense_1", kernel_init=nn.initializers.zeros)(h)
        return out[..., 0]
