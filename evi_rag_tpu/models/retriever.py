"""The retriever: a question-conditioned per-edge (triple) scorer.

TPU-native re-design of the reference ``Retriever``
(``src/models/components/retriever.py:102-623``).  Score path per edge
(h, r, t) given question q:

1. project frozen text embeddings (entity/relation/query Linear+Tanh,
   reference ``projections.py:9-43``), with a learned embedding substituted
   for non-text entities (``retriever.py:497-507``);
2. DDE structural features from the topic one-hot (``retriever.py:519-553``),
   edge struct = concat(head_struct, tail_struct);
3. question-contextualized relation ``r_ctx = r * sigmoid(Wg q) + tanh(Wb q)``
   (``retriever.py:464``);
4. geometry: DistMult interaction ``h * r_ctx * t`` gated by a structural
   nav-gate, TransE error ``h + r_ctx - t`` and its negative L2 norm
   (``retriever.py:470-480``);
5. MLP state_net -> score head -> scalar logit (``retriever.py:482-484``);
6. twin-view bidirectional scoring with softmax-weighted combine
   (``retriever.py:369-381``) and train-time hide-and-seek stochastic bias
   (``retriever.py:291-367``).

Everything is dense elementwise/matmul work over the padded edge axis -- XLA
fuses the whole score path into a handful of MXU matmuls + VPU epilogues; the
padded layout keeps shapes static across batches of ragged graphs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from evi_rag_tpu.ops.nnfn import gelu_exact as _gelu_exact
from evi_rag_tpu.models.batches import RetrieverBatch
from evi_rag_tpu.models.dde import build_node_struct_features


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RetrieverOutput:
    """Mirror of reference ``RetrieverOutput`` (``retriever.py:80-99``)."""

    logits: jax.Array           # [E]
    logits_fwd: jax.Array       # [E]
    logits_bwd: jax.Array       # [E]
    edge_embeddings: jax.Array  # [E, H]


class EmbeddingProjector(nn.Module):
    """Linear + tanh projection of frozen text embeddings."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.tanh(nn.Dense(self.features, name="proj")(x))


class SplitInputDense(nn.Module):
    """``nn.Dense`` over a conceptual concat input, applied piece-by-piece.

    Identical parameters to ``nn.Dense(features)`` called on
    ``concat(parts, -1)`` — same ``kernel``/``bias`` names, shapes, and init —
    but the wide ``[E, sum(d_i)]`` concat is never materialized: each piece
    multiplies its own kernel row-slice and the partial products accumulate
    in f32.  On the train step this removes the largest HBM buffers XLA was
    otherwise forced to materialize (the ``[E, 3D+1]`` activation and its two
    f32 backward cotangent copies — ~0.8 GB of the 11.5 GB/step at
    E=16384, D=1024).  The serving kernels already consume this kernel in
    row-sliced form (``ops/pallas_score.py:46-50``).
    """

    features: int
    in_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts: tuple[jax.Array, ...]) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        acc = bias.astype(jnp.float32)
        off = 0
        for p in parts:
            d = p.shape[-1]
            k = kernel[off : off + d].astype(self.dtype)
            acc = acc + jax.lax.dot_general(
                p.astype(self.dtype),
                k,
                (((p.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            off += d
        if off != self.in_features:
            raise ValueError(f"parts sum to {off} features, kernel has {self.in_features}")
        return acc.astype(self.dtype)


class Retriever(nn.Module):
    """Geometry-mode bidirectional triple scorer."""

    emb_dim: int = 1024
    hidden_dim: int = 1024
    num_topics: int = 2
    dde_rounds: int = 2
    dde_reverse_rounds: int = 2
    dropout_p: float = 0.1
    direction_mode: str = "bidirectional"  # forward|backward|bidirectional
    # Mixed precision: run the dense score path in bf16 on the MXU with f32
    # logits/reductions (the reference trains under Lightning 16-mixed,
    # configs/trainer/{gpu,ddp}.yaml).  "float32" keeps full precision.
    compute_dtype: str = "float32"  # float32 | bfloat16
    # hide-and-seek stochastic near/far demotion (reference retriever.py:291-367)
    hide_seek_enabled: bool = False
    hide_seek_p_near: float = 0.0
    hide_seek_p_far: float = 0.0
    hide_seek_bias_near: float = 0.0
    hide_seek_bias_far: float = 0.0
    hide_seek_apply_in_eval: bool = False

    @property
    def topic_struct_dim(self) -> int:
        return self.num_topics * (1 + self.dde_rounds + self.dde_reverse_rounds)

    def parity_meta(self) -> dict[str, int]:
        """Feature-geometry contract exported into checkpoints.

        The reference persists a ``parity_meta`` buffer so the GFlowNet
        embedder can rebuild identical features (``retriever.py:143-155``,
        ``gflownet_embedder.py:634-871``).
        """
        return {
            "use_topic_pe": 1,
            "num_topics": self.num_topics,
            "dde_rounds": self.dde_rounds,
            "dde_reverse_rounds": self.dde_reverse_rounds,
        }

    def setup(self) -> None:
        if self.direction_mode not in ("forward", "backward", "bidirectional"):
            raise ValueError(f"invalid direction_mode {self.direction_mode!r}")
        if self.num_topics != 2:
            raise ValueError("num_topics must be 2 (seed vs non-seed)")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"compute_dtype must be float32|bfloat16, got {self.compute_dtype!r}"
            )
        d, h = self.emb_dim, self.hidden_dim
        cdtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        self.entity_proj = EmbeddingProjector(d, name="entity_proj")
        self.relation_proj = EmbeddingProjector(d, name="relation_proj")
        self.query_proj = EmbeddingProjector(d, name="query_proj")
        self.non_text_entity_emb = self.param(
            "non_text_entity_emb", nn.initializers.normal(1.0), (d,)
        )
        self.q_gate = nn.Dense(d, name="q_gate", dtype=cdtype)
        self.q_bias = nn.Dense(d, name="q_bias", dtype=cdtype)
        self.struct_proj = nn.Dense(d, name="struct_proj", dtype=cdtype)
        self.struct_norm = nn.LayerNorm(name="struct_norm", dtype=cdtype, epsilon=1e-5)
        self.struct_gate = nn.Dense(1, name="struct_gate", dtype=cdtype)
        self.state_net_0 = SplitInputDense(
            h, in_features=3 * d + 1, name="state_net_0", dtype=cdtype
        )
        self.state_norm = nn.LayerNorm(name="state_norm", dtype=cdtype, epsilon=1e-5)
        self.state_net_1 = nn.Dense(h, name="state_net_1", dtype=cdtype)
        self.score_head = nn.Dense(1, name="score_head")
        self.dropout = nn.Dropout(self.dropout_p)

    def __call__(
        self,
        batch: RetrieverBatch,
        *,
        train: bool = False,
    ) -> RetrieverOutput:
        gb = batch.graph
        heads, tails = gb.heads, gb.tails
        cdtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

        # --- projections (retriever.py:403-451) ---
        query_repr_g = self.query_proj(batch.question_emb.astype(cdtype))  # [G, D]
        query_repr = query_repr_g[gb.edge_batch]                 # [E, D]
        node_repr = self.entity_proj(batch.node_emb.astype(cdtype))  # [N, D]
        non_text = self.entity_proj(self.non_text_entity_emb[None, :])[0]
        node_repr = jnp.where(batch.node_is_nontext[:, None], non_text[None, :], node_repr)
        head_repr = node_repr[heads]
        tail_repr = node_repr[tails]
        relation_repr = self.relation_proj(batch.edge_emb.astype(cdtype))  # [E, D]

        # --- structural features (retriever.py:519-553) ---
        node_struct = build_node_struct_features(
            batch.topic_one_hot.astype(jnp.float32),
            gb.edge_index,
            num_rounds=self.dde_rounds,
            num_reverse_rounds=self.dde_reverse_rounds,
            edge_mask=gb.edge_mask,
        )  # [N, topic_struct_dim]
        node_struct = node_struct.astype(cdtype)
        struct_fwd = jnp.concatenate([node_struct[heads], node_struct[tails]], axis=-1)
        struct_bwd = jnp.concatenate([node_struct[tails], node_struct[heads]], axis=-1)

        # --- question-contextualized relation (retriever.py:464) ---
        r_gate = jax.nn.sigmoid(self.q_gate(query_repr))
        r_shift = jnp.tanh(self.q_bias(query_repr))
        r_ctx = relation_repr * r_gate + r_shift

        def score(h_r: jax.Array, t_r: jax.Array, struct_raw: jax.Array):
            """One directional pass (retriever.py:453-484)."""
            struct_ctx = _gelu_exact(self.struct_norm(self.struct_proj(struct_raw)))
            nav_gate = jax.nn.sigmoid(self.struct_gate(struct_ctx))
            interaction = h_r * r_ctx * t_r * nav_gate
            error_vec = h_r + r_ctx - t_r
            err32 = error_vec.astype(jnp.float32)
            dist = -jnp.sqrt(jnp.sum(err32 * err32, axis=-1, keepdims=True) + 1e-12)
            dist = dist.astype(error_vec.dtype)
            # combined = concat([interaction, struct_ctx, error_vec, dist]);
            # applied piecewise so the [E, 3D+1] concat never hits HBM.
            feats = _gelu_exact(
                self.state_norm(
                    self.state_net_0((interaction, struct_ctx, error_vec, dist))
                )
            )
            feats = self.dropout(feats, deterministic=not train)
            feats = self.state_net_1(feats)
            logits = self.score_head(feats)[..., 0].astype(jnp.float32)
            return logits, feats

        want_fwd = self.direction_mode in ("forward", "bidirectional")
        want_bwd = self.direction_mode in ("backward", "bidirectional")
        logits_fwd, feats_fwd = score(head_repr, tail_repr, struct_fwd) if want_fwd else (None, None)
        logits_bwd, feats_bwd = score(tail_repr, head_repr, struct_bwd) if want_bwd else (None, None)

        # --- hide-and-seek bias (retriever.py:291-367) ---
        bias = self._hide_seek_bias(batch, train=train)
        if bias is not None:
            logits_fwd = logits_fwd + bias if logits_fwd is not None else None
            logits_bwd = logits_bwd + bias if logits_bwd is not None else None

        if self.direction_mode == "bidirectional":
            stacked = jnp.stack([logits_fwd, logits_bwd], axis=0)  # [2, E]
            weights = jax.nn.softmax(stacked, axis=0)
            logits = jnp.sum(weights * stacked, axis=0)
            edge_embeddings = (
                weights[0][:, None] * feats_fwd + weights[1][:, None] * feats_bwd
            )
        elif self.direction_mode == "forward":
            logits, edge_embeddings = logits_fwd, feats_fwd
            logits_bwd = logits_fwd
        else:
            logits, edge_embeddings = logits_bwd, feats_bwd
            logits_fwd = logits_bwd

        return RetrieverOutput(
            logits=logits,
            logits_fwd=logits_fwd,
            logits_bwd=logits_bwd,
            edge_embeddings=edge_embeddings,
        )

    def _hide_seek_bias(self, batch: RetrieverBatch, *, train: bool) -> jax.Array | None:
        if not self.hide_seek_enabled:
            return None
        if not train and not self.hide_seek_apply_in_eval:
            return None
        if self.hide_seek_p_near <= 0.0 and self.hide_seek_p_far <= 0.0:
            return None
        if self.hide_seek_bias_near == 0.0 and self.hide_seek_bias_far == 0.0:
            return None
        near = batch.edge_is_near
        drop_prob = jnp.where(near, self.hide_seek_p_near, self.hide_seek_p_far)
        u = jax.random.uniform(self.make_rng("hide_seek"), drop_prob.shape)
        drop = u < drop_prob
        bias_values = jnp.where(near, self.hide_seek_bias_near, self.hide_seek_bias_far)
        return jnp.where(drop, bias_values, 0.0)
