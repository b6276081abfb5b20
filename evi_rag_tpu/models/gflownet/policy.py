"""Edge policy with candidate-masked single-head attention pooling.

Re-design of the reference ``GFlowNetEdgePolicy`` (``src/models/components/
gflownet_policy.py:49-152``).  NOTE: that file has a SyntaxError at reference
HEAD (``forward(..., edge_base=None, *, **_)`` at :99-101); the *intended*
behaviour -- optional precomputed ``edge_base`` -- is the spec here.

Per step: state attends over its graph's candidate edges (dot-product, one
head, scaled), the pooled context refines the state, the edge head scores
[state ‖ edge] pairs, the stop head scores the refined state.  In the padded
layout the reference's candidate gather/scatter (``cand_idx`` indexing)
disappears: everything computes densely over the padded edge axis and invalid
edges are -inf-masked -- on TPU the dense path vectorizes better than the
gather path, and candidate sets are a large fraction of edges anyway.

Last linears are zero-initialized so the policy starts near-uniform
(``gflownet_policy.py:10-21``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from evi_rag_tpu.ops.segment import NEG_INF, segment_softmax, segment_sum
from evi_rag_tpu.ops.nnfn import gelu_exact as _gelu_exact


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PolicyStepTensors:
    """Per-rollout-step policy tensors hoisted out of the step loop.

    The rollout's per-step edge-axis matmuls -- attn k/v over [E, H] and the
    edge half of the edge head's LayerNorm+Dense over [E, 2H] -- depend only
    on ``edge_repr`` (edge_base + that step's dropout mask), never on the
    evolving state.  Batching them over the step axis turns T small
    sequentially-dependent matmuls into one [T*E, *] MXU launch each, leaving
    only [G, H]-sized matmuls and VPU segment work inside the scan (the
    "fused rollout step" restructure of VERDICT r3 #5; the reference instead
    re-runs the full policy per Python-loop step,
    ``gflownet_actor.py:74-373``).

    Leading axis T: ``lax.scan`` slices it per step.
    """

    k: jax.Array        # [T, E, H] attention keys (compute dtype)
    v: jax.Array        # [T, E, H] attention values (compute dtype)
    p_edge: jax.Array   # [T, E, H] f32 (edge_repr . gamma_e) @ W0_e
    sum_e: jax.Array    # [T, E] f32 per-row sum of the edge half
    sumsq_e: jax.Array  # [T, E] f32 per-row sum of squares of the edge half
    # Edge-head dropout mask, stored as BOOL (1 byte/elt, not the compute
    # dtype's 2-4): [T, E, H] step tensors are scan inputs AND backward
    # residuals, so their bytes are paid in HBM traffic every step of both
    # passes.  ``drop2_scale`` carries the {1/keep | 1.0} factor so
    # ``apply_precomputed`` reconstructs flax Dropout's exact values.
    drop2: jax.Array        # [T, E, H] bool keep-mask
    drop2_scale: jax.Array  # [T] compute-dtype: 1/keep (train) or 1.0


class GFlowNetEdgePolicy(nn.Module):
    hidden_dim: int
    dropout: float = 0.1
    # Mixed precision for the per-edge network (the rollout's HBM hot spot:
    # [E, H] edge tensors and the [E, 2H] edge-head input, recomputed every
    # step x rollout).  Matches the reference's Lightning 16-mixed training
    # (configs/trainer/gpu.yaml); logits, log-probs, and everything the
    # sampler/SubTB consumes stay f32.  Params are f32 either way.
    compute_dtype: str = "float32"  # float32 | bfloat16

    def setup(self) -> None:
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"compute_dtype must be float32|bfloat16, got {self.compute_dtype!r}"
            )
        h = self.hidden_dim
        cdtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        self.state_norm = nn.LayerNorm(name="state_norm", epsilon=1e-5, dtype=cdtype)
        self.edge_base_norm = nn.LayerNorm(name="edge_base_norm", epsilon=1e-5, dtype=cdtype)
        self.edge_base_dense = nn.Dense(h, name="edge_base_dense", dtype=cdtype)
        self.edge_dropout = nn.Dropout(self.dropout)
        self.attn_q = nn.Dense(h, use_bias=False, name="attn_q", dtype=cdtype)
        self.attn_k = nn.Dense(h, use_bias=False, name="attn_k", dtype=cdtype)
        self.attn_v = nn.Dense(h, use_bias=False, name="attn_v", dtype=cdtype)
        self.edge_head_norm = nn.LayerNorm(name="edge_head_norm", epsilon=1e-5, dtype=cdtype)
        self.edge_head_0 = nn.Dense(h, name="edge_head_0", dtype=cdtype)
        self.edge_head_drop = nn.Dropout(self.dropout)
        self.edge_head_1 = nn.Dense(1, name="edge_head_1", kernel_init=nn.initializers.zeros, dtype=cdtype)
        self.stop_head_norm = nn.LayerNorm(name="stop_head_norm", epsilon=1e-5, dtype=cdtype)
        self.stop_head_0 = nn.Dense(h, name="stop_head_0", dtype=cdtype)
        self.stop_head_1 = nn.Dense(1, name="stop_head_1", kernel_init=nn.initializers.zeros, dtype=cdtype)

    def compute_edge_base(self, edge_tokens: jax.Array) -> jax.Array:
        """Step-invariant edge projection, hoisted out of the rollout loop
        (the reference precomputes it once per rollout, ``gflownet_policy.py:
        88-91`` + ``gflownet_actor.py:110-112``)."""
        return _gelu_exact(self.edge_base_dense(self.edge_base_norm(edge_tokens)))

    def precompute_steps(
        self,
        edge_tokens: jax.Array,
        num_steps: int,
        *,
        edge_base: jax.Array | None = None,
        train: bool = False,
    ) -> PolicyStepTensors:
        """All per-step edge-axis matmuls, batched over the T step axis.

        Per-step dropout masks are sampled here (independently per step, as
        the canonical per-step path does -- only the rng stream differs); the
        edge half of ``edge_head_norm + edge_head_0`` is folded into
        ``p_edge`` via the LayerNorm split used by ``apply_precomputed``.
        """
        if edge_base is None:
            edge_base = self.compute_edge_base(edge_tokens)
        e, h = edge_base.shape
        reps = jnp.broadcast_to(edge_base[None], (num_steps, e, h))
        # One Dropout call over [T, E, H] == independent per-step masks.
        edge_repr = self.edge_dropout(reps, deterministic=not train)
        k = self.attn_k(edge_repr)
        v = self.attn_v(edge_repr)
        gamma = self.edge_head_norm.variables["params"]["scale"]  # [2H]
        w0 = self.edge_head_0.variables["params"]["kernel"]       # [2H, H]
        b = edge_repr.astype(jnp.float32)
        p_edge = jnp.matmul(
            b * gamma[h:].astype(jnp.float32),
            w0[h:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        # The dropout layer's {0, 1/keep} values compress to bool + scalar:
        # same rng stream, same mask, 1 byte per element in the carried
        # tensor instead of 2-4 (the transient float mask fuses away).
        drop2 = self.edge_head_drop(
            jnp.ones((num_steps, e, h), cd), deterministic=not train
        ) != 0
        live = train and self.dropout > 0.0
        # [T] (not scalar) so lax.scan / vmap can slice the step axis like
        # every other field of the struct.
        drop2_scale = jnp.broadcast_to(
            jnp.ones((), cd) / (1.0 - self.dropout) if live else jnp.ones((), cd),
            (num_steps,),
        )
        # bf16 mode stores the [T, E, H] tensors in the compute dtype: the
        # canonical path's Dense/Dropout already round these to bf16, and the
        # f32 copies were pure HBM-residual overhead in the backward pass.
        return PolicyStepTensors(
            k=k, v=v, p_edge=p_edge.astype(cd),
            sum_e=b.sum(-1), sumsq_e=(b * b).sum(-1), drop2=drop2,
            drop2_scale=drop2_scale,
        )

    def apply_precomputed(
        self,
        step: PolicyStepTensors,       # one [E, ...] step slice (scan-sliced)
        state_tokens: jax.Array,       # [G, H]
        edge_batch: jax.Array,         # [E]
        valid_edges_mask: jax.Array,   # [E] bool
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Per-step policy using hoisted tensors: same math as ``__call__``
        with the edge-head LayerNorm+Dense split as

            LN(concat(a, b)) @ W0 + b0
              = [(a.g_a) @ W0_a + (b.g_b) @ W0_b - mu (g @ W0)] / sigma
                + (beta @ W0 + b0)

        where mu/sigma combine per-half running sums (flax LayerNorm computes
        stats in f32 with fast variance; so does this).  The only remaining
        per-step matmuls are [G, H]-sized (state side) plus the [E, H] -> [E]
        edge_head_1 matvec."""
        num_graphs, h = state_tokens.shape
        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

        state_base = self.state_norm(state_tokens)
        q = self.attn_q(state_base)[edge_batch]               # [E, H]
        att_logits = (
            jnp.sum(q.astype(jnp.float32) * step.k.astype(jnp.float32), axis=-1)
            / max(math.sqrt(self.hidden_dim), 1.0)
        )
        att_w = segment_softmax(att_logits, edge_batch, num_graphs, mask=valid_edges_mask)
        context = segment_sum(
            att_w[:, None] * step.v.astype(jnp.float32),
            edge_batch, num_graphs, mask=valid_edges_mask,
        )
        state_out = self.state_norm(
            state_tokens.astype(jnp.float32) + context
        ).astype(jnp.float32)

        gamma = self.edge_head_norm.variables["params"]["scale"].astype(jnp.float32)
        beta = self.edge_head_norm.variables["params"]["bias"].astype(jnp.float32)
        w0 = self.edge_head_0.variables["params"]["kernel"].astype(jnp.float32)
        b0 = self.edge_head_0.variables["params"]["bias"].astype(jnp.float32)
        # Match the canonical path's cast of state_out into the concat dtype.
        a = state_out.astype(cd).astype(jnp.float32)          # [G, H]
        p_state = jnp.matmul(a * gamma[:h], w0[:h], preferred_element_type=jnp.float32)
        mu = (a.sum(-1)[edge_batch] + step.sum_e) / (2.0 * h)
        var = ((a * a).sum(-1)[edge_batch] + step.sumsq_e) / (2.0 * h) - mu * mu
        inv = jax.lax.rsqrt(var + 1e-5)                        # edge_head_norm eps
        u = gamma @ w0                                         # [H]
        const = beta @ w0 + b0                                 # [H]
        h_pre = (
            p_state[edge_batch] + step.p_edge.astype(jnp.float32)
            - mu[:, None] * u[None, :]
        ) * inv[:, None] + const[None, :]
        hh = _gelu_exact(h_pre.astype(cd)) * jnp.where(
            step.drop2, step.drop2_scale, jnp.zeros((), cd)
        )
        edge_logits = self.edge_head_1(hh)[..., 0].astype(jnp.float32)
        edge_logits = jnp.where(valid_edges_mask, edge_logits, NEG_INF)

        s = _gelu_exact(self.stop_head_0(self.stop_head_norm(state_out.astype(cd))))
        stop_logits = self.stop_head_1(s)[..., 0].astype(jnp.float32)
        return edge_logits, stop_logits, state_out

    def __call__(
        self,
        edge_tokens: jax.Array,       # [E, H]
        state_tokens: jax.Array,      # [G, H]
        edge_batch: jax.Array,        # [E]
        valid_edges_mask: jax.Array,  # [E] bool
        *,
        edge_base: jax.Array | None = None,
        train: bool = False,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        num_graphs = state_tokens.shape[0]
        if edge_base is None:
            edge_base = self.compute_edge_base(edge_tokens)
        edge_repr = self.edge_dropout(edge_base, deterministic=not train)

        state_base = self.state_norm(state_tokens)
        q = self.attn_q(state_base)[edge_batch]          # [E, H]
        k = self.attn_k(edge_repr)
        v = self.attn_v(edge_repr)
        # Attention weights and the pooled context accumulate in f32: the
        # softmax normalization is the one place bf16 rounding would leak
        # into action probabilities beyond logit quantization.
        att_logits = (
            jnp.sum(q.astype(jnp.float32) * k.astype(jnp.float32), axis=-1)
            / max(math.sqrt(self.hidden_dim), 1.0)
        )
        att_w = segment_softmax(att_logits, edge_batch, num_graphs, mask=valid_edges_mask)
        context = segment_sum(
            att_w[:, None] * v.astype(jnp.float32),
            edge_batch, num_graphs, mask=valid_edges_mask,
        )
        state_out = self.state_norm(
            state_tokens.astype(jnp.float32) + context
        ).astype(jnp.float32)

        edge_in = jnp.concatenate(
            [state_out.astype(edge_repr.dtype)[edge_batch], edge_repr], axis=-1
        )
        h = _gelu_exact(self.edge_head_0(self.edge_head_norm(edge_in)))
        h = self.edge_head_drop(h, deterministic=not train)
        edge_logits = self.edge_head_1(h)[..., 0].astype(jnp.float32)
        edge_logits = jnp.where(valid_edges_mask, edge_logits, NEG_INF)

        s = _gelu_exact(self.stop_head_0(self.stop_head_norm(state_out.astype(edge_repr.dtype))))
        stop_logits = self.stop_head_1(s)[..., 0].astype(jnp.float32)
        return edge_logits, stop_logits, state_out
