"""Device-resident triple-scoring query engine with streaming top-k.

The north-star serving path (BASELINE.json): the trained retriever becomes an
index-and-query engine.  At index build time the frozen projections are
*pre-applied* -- entity/relation text embeddings are pushed through the
retriever's entity/relation projectors once and stored device-resident, so a
query only pays the question-conditioned geometry + MLP head per candidate.

Per (query q, candidate (h, r, t, struct)):

    r_ctx  = r * sigmoid(Wg q) + tanh(Wb q)          (query-conditioned, O(D^2)
                                                      once per query, not per edge)
    score  = score_head(state_net([h*r_ctx*t*gate ‖ struct_ctx ‖ h+r_ctx-t ‖
                                   -|h+r_ctx-t|]))

The candidate axis is processed in fixed-size chunks under ``lax.scan`` with
a running top-k merge, so memory stays O(chunk) regardless of candidate-set
size; chunks of >=1024 keep the state_net matmuls MXU-shaped.  The same
entry point shards the candidate axis across a mesh for million-triple
fan-out (`shard_map` over the data axis; each shard computes a local top-k
and the k-merge is a tiny all-gather).

The struct features are the per-question DDE features of the candidate
subgraph, exactly as in training (``models/retriever.py``); scoring parity
with the training-time model is covered by tests.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from evi_rag_tpu.ops.nnfn import dense as _dense, dense_split as _dense_split, gelu_exact as _gelu_exact, layernorm as _layernorm, projector as _projector


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TripleIndex:
    """Device-resident, projection-pre-applied candidate store."""

    head_repr: jax.Array    # [M, D] projected entity reprs (tanh proj applied)
    rel_repr: jax.Array     # [M, D]
    tail_repr: jax.Array    # [M, D]
    struct_raw: jax.Array   # [M, S] raw edge structural features (DDE)

    @property
    def num_candidates(self) -> int:
        return self.head_repr.shape[0]


def build_triple_index(
    bundle: dict[str, Any],
    *,
    entity_emb: jax.Array,      # [V, D] raw text embeddings
    relation_emb: jax.Array,    # [R, D]
    nontext_mask: jax.Array,    # [V] bool
    heads: jax.Array,           # [M] entity ids
    rels: jax.Array,            # [M] relation ids
    tails: jax.Array,           # [M]
    struct_raw: jax.Array,      # [M, S]
) -> TripleIndex:
    """Project tables once, then gather per-candidate rows (index build)."""
    feats = bundle["features"]
    ent = _projector(feats["entity_proj"], entity_emb)
    non_text = _projector(feats["entity_proj"], feats["non_text_entity_emb"][None, :])[0]
    ent = jnp.where(nontext_mask[:, None], non_text[None, :], ent)
    rel = _projector(feats["relation_proj"], relation_emb)
    return TripleIndex(
        head_repr=ent[heads],
        rel_repr=rel[rels],
        tail_repr=ent[tails],
        struct_raw=struct_raw,
    )


def build_triple_index_sharded(
    bundle: dict[str, Any],
    *,
    mesh,
    entity_emb: jax.Array,      # [V, D] sharded NamedSharding(mesh, P('data'))
    relation_emb: jax.Array,    # [R, D] replicated (relation vocab is small)
    nontext_mask: jax.Array,    # [V] sharded like entity_emb
    heads: jax.Array,           # [M] global entity ids (replicated)
    rels: jax.Array,
    tails: jax.Array,
    struct_raw: jax.Array,      # [M, S]
) -> TripleIndex:
    """Index build with the entity table sharded over the mesh.

    Freebase-scale vocabularies (tens of millions x 1024) do not fit one
    device, so the table stays row-sharded: each device projects its local
    rows (pure local matmul), then candidate rows are fetched with a
    local-gather + masked ``psum`` -- the full projected table is never
    materialized on any device (VERDICT round-1 next-step #7).
    """
    from functools import partial as _partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    feats = bundle["features"]
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    v = entity_emb.shape[0]
    if v % n_dev != 0:
        raise ValueError(f"vocab rows {v} must divide evenly over {n_dev} devices")
    local_v = v // n_dev
    non_text_row = _projector(feats["entity_proj"], feats["non_text_entity_emb"][None, :])[0]

    @_partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def gather_rows(table_local, nontext_local, h_ids, t_ids):
        proj_local = _projector(feats["entity_proj"], table_local)
        proj_local = jnp.where(
            nontext_local[:, None], non_text_row[None, :], proj_local
        )
        off = jax.lax.axis_index(axis).astype(jnp.int32) * local_v

        def fetch(ids):
            loc = ids.astype(jnp.int32) - off
            ok = (loc >= 0) & (loc < local_v)
            rows = proj_local[jnp.clip(loc, 0, local_v - 1)]
            rows = jnp.where(ok[:, None], rows, 0.0)
            return jax.lax.psum(rows, axis)

        return fetch(h_ids), fetch(t_ids)

    head_repr, tail_repr = gather_rows(entity_emb, nontext_mask, heads, tails)
    rel = _projector(feats["relation_proj"], relation_emb)
    return TripleIndex(
        head_repr=head_repr,
        rel_repr=rel[rels],
        tail_repr=tail_repr,
        struct_raw=struct_raw,
    )


def _query_context(feats: dict[str, Any], q_emb: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-query tensors: (projected query, gate, bias) -- computed once."""
    q = _projector(feats["query_proj"], q_emb)
    return q, jax.nn.sigmoid(_dense(feats["q_gate"], q)), jnp.tanh(_dense(feats["q_bias"], q))


def _score_chunk(
    feats: dict[str, Any],
    gate: jax.Array,     # [D]
    bias: jax.Array,     # [D]
    h: jax.Array,        # [C, D]
    r: jax.Array,
    t: jax.Array,
    struct_raw: jax.Array,  # [C, S]
    dtype=jnp.bfloat16,
) -> jax.Array:
    """[C] scores for one query over one candidate chunk (MXU-friendly)."""
    h = h.astype(dtype)
    r = r.astype(dtype)
    t = t.astype(dtype)
    r_ctx = r * gate.astype(dtype)[None, :] + bias.astype(dtype)[None, :]
    struct_ctx = _gelu_exact(
        _layernorm(feats["struct_norm"], _dense(feats["struct_proj"], struct_raw.astype(dtype)))
    )
    nav = jax.nn.sigmoid(_dense(feats["struct_gate"], struct_ctx))
    inter = h * r_ctx * t * nav
    err = h + r_ctx - t
    dist = -jnp.sqrt(jnp.sum((err * err).astype(jnp.float32), axis=-1, keepdims=True) + 1e-12)
    # combined = concat([inter, struct_ctx, err, dist]); split form matches
    # the training path's SplitInputDense bit-for-bit on the MXU.
    z = _gelu_exact(_layernorm(
        feats["state_norm"],
        _dense_split(
            feats["state_net_0"], (inter, struct_ctx, err, dist), dtype
        ),
    ))
    z = _dense(feats["state_net_1"], z)
    return _dense(feats["score_head"], z)[..., 0].astype(jnp.float32)


@partial(jax.jit, static_argnames=("k", "chunk", "bidirectional", "dtype"))
def query_topk(
    bundle: dict[str, Any],
    q_emb: jax.Array,       # [B, D] raw question embeddings
    index: TripleIndex,
    *,
    k: int,
    chunk: int = 2048,
    bidirectional: bool = True,
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Top-k candidates per query: ([B, k] scores, [B, k] candidate ids).

    Streams the candidate axis in ``chunk``-sized tiles with a running top-k
    merge (O(chunk + k) live memory per query).  ``bidirectional`` reproduces
    the training-time twin-view softmax combine (``retriever.py:369-381``).
    """
    feats = bundle["features"]
    m = index.num_candidates
    num_chunks = -(-m // chunk)
    pad = num_chunks * chunk - m
    neg = jnp.float32(-jnp.inf)

    def pad_to(x, fill=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)

    heads = pad_to(index.head_repr).reshape(num_chunks, chunk, -1)
    rels = pad_to(index.rel_repr).reshape(num_chunks, chunk, -1)
    tails = pad_to(index.tail_repr).reshape(num_chunks, chunk, -1)
    struct = pad_to(index.struct_raw).reshape(num_chunks, chunk, -1)
    s_dim = struct.shape[-1] // 2
    valid = (jnp.arange(num_chunks * chunk) < m).reshape(num_chunks, chunk)

    def one_query(q_row: jax.Array) -> tuple[jax.Array, jax.Array]:
        _, gate, bias = _query_context(feats, q_row)

        def body(carry, xs):
            top_v, top_i = carry
            h, r, t, s, ok, base = xs
            fwd = _score_chunk(feats, gate, bias, h, r, t, s, dtype=dtype)
            if bidirectional:
                s_swap = jnp.concatenate([s[:, s_dim:], s[:, :s_dim]], axis=-1)
                bwd = _score_chunk(feats, gate, bias, t, r, h, s_swap, dtype=dtype)
                stacked = jnp.stack([fwd, bwd])
                w = jax.nn.softmax(stacked, axis=0)
                scores = jnp.sum(w * stacked, axis=0)
            else:
                scores = fwd
            scores = jnp.where(ok, scores, neg)
            ids = base + jnp.arange(chunk, dtype=jnp.int32)
            all_v = jnp.concatenate([top_v, scores])
            all_i = jnp.concatenate([top_i, ids])
            new_v, pos = jax.lax.top_k(all_v, k)
            return (new_v, all_i[pos]), None

        init = (jnp.full((k,), neg), jnp.full((k,), -1, jnp.int32))
        bases = (jnp.arange(num_chunks, dtype=jnp.int32) * chunk)
        (top_v, top_i), _ = jax.lax.scan(
            body, init, (heads, rels, tails, struct, valid, bases)
        )
        return top_v, top_i

    return jax.vmap(one_query)(q_emb)


def query_topk_sharded(
    bundle: dict[str, Any],
    q_emb: jax.Array,       # [B, D]
    index: TripleIndex,     # candidate axis sharded over the mesh data axis
    *,
    mesh,
    k: int,
    chunk: int = 2048,
    bidirectional: bool = True,
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Million-triple fan-out: shard the candidate axis across the mesh.

    Each device scores its local candidate shard and keeps a local top-k;
    the k-merge is one tiny ``all_gather`` of [k] rows over ICI -- the
    natural "model-parallel" axis for this workload (SURVEY §2c).  Candidate
    ids returned are global.  ``index`` arrays must be sharded with
    ``NamedSharding(mesh, P('data'))`` on the leading axis (equal shards).
    """
    from functools import partial as _partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    m = index.num_candidates
    if m % n_dev != 0:
        raise ValueError(f"candidate count {m} must divide evenly over {n_dev} devices")
    local_m = m // n_dev

    @_partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(q, h, r, t, s):
        local = TripleIndex(head_repr=h, rel_repr=r, tail_repr=t, struct_raw=s)
        v, i = query_topk(
            bundle, q, local, k=k, chunk=min(chunk, local_m),
            bidirectional=bidirectional, dtype=dtype,
        )
        i = i + jax.lax.axis_index(axis).astype(jnp.int32) * local_m
        vs = jax.lax.all_gather(v, axis, axis=0)      # [n_dev, B, k]
        is_ = jax.lax.all_gather(i, axis, axis=0)
        b = q.shape[0]
        vs = jnp.transpose(vs, (1, 0, 2)).reshape(b, -1)
        is_ = jnp.transpose(is_, (1, 0, 2)).reshape(b, -1)
        top_v, pos = jax.lax.top_k(vs, k)
        top_i = jnp.take_along_axis(is_, pos, axis=1)
        return top_v, top_i

    return run(q_emb, index.head_repr, index.rel_repr, index.tail_repr, index.struct_raw)


@partial(jax.jit, static_argnames=("k", "dtype"))
def query_topk_per_question(
    bundle: dict[str, Any],
    q_emb: jax.Array,        # [G, D] question embeddings
    head_repr: jax.Array,    # [G, M, D] per-question candidate rows (padded)
    rel_repr: jax.Array,     # [G, M, D]
    tail_repr: jax.Array,    # [G, M, D]
    struct_raw: jax.Array,   # [G, M, S]
    edge_valid: jax.Array,   # [G, M] bool (False on padding)
    *,
    k: int,
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Serving over per-question subgraphs: each question scores only its
    own candidate set (the reference's retrieval semantics -- scores are
    exactly ``Retriever.apply`` logits) and keeps a local top-k.

    Candidates arrive pre-projected (``build_triple_index`` tables), so the
    per-question work is just the query-conditioned geometry + MLP head --
    the batched form keeps the [G*M, D]x[D, H] matmuls MXU-shaped.  Padding
    scores are -inf, so ``k`` may exceed a question's true edge count.
    Returns ([G, k] scores, [G, k] local candidate ids).
    """
    feats = bundle["features"]
    s_dim = struct_raw.shape[-1] // 2

    def one(q_row, h, r, t, s, ok):
        _, gate, bias = _query_context(feats, q_row)
        fwd = _score_chunk(feats, gate, bias, h, r, t, s, dtype=dtype)
        s_swap = jnp.concatenate([s[:, s_dim:], s[:, :s_dim]], axis=-1)
        bwd = _score_chunk(feats, gate, bias, t, r, h, s_swap, dtype=dtype)
        stacked = jnp.stack([fwd, bwd])
        w = jax.nn.softmax(stacked, axis=0)
        scores = jnp.where(ok, jnp.sum(w * stacked, axis=0), -jnp.inf)
        return jax.lax.top_k(scores, k)

    return jax.vmap(one)(q_emb, head_repr, rel_repr, tail_repr, struct_raw, edge_valid)


def query_topk_sharded_fused(
    bundle: dict[str, Any],
    q_emb: jax.Array,       # [B, D]
    index: TripleIndex,     # candidate axis sharded over the mesh data axis
    *,
    mesh,
    k: int,
    bq: int | None = None,
    tile: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused-kernel variant of :func:`query_topk_sharded`.

    Same sharding contract (candidate arrays row-sharded ``P('data')``, equal
    shards), but each device runs the in-kernel streaming top-k Pallas path
    (``ops.pallas_score.pallas_query_topk_fused``) over its local shard
    instead of the chunked XLA scorer, so the multi-chip fan-out inherits
    the single-chip kernel speedup.  The k-merge stays one [k]-row
    ``all_gather`` over ICI.  ``interpret=True`` runs the kernel in Pallas
    interpret mode (CPU meshes / tests).
    """
    from functools import partial as _partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from evi_rag_tpu.ops.pallas_score import pallas_query_topk_fused

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    m = index.num_candidates
    if m % n_dev != 0:
        raise ValueError(f"candidate count {m} must divide evenly over {n_dev} devices")
    local_m = m // n_dev

    @_partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(q, h, r, t, s):
        local = TripleIndex(head_repr=h, rel_repr=r, tail_repr=t, struct_raw=s)
        v, i = pallas_query_topk_fused(
            bundle, q, local, k=k, bq=bq, tile=tile, interpret=interpret,
        )
        i = i + jax.lax.axis_index(axis).astype(jnp.int32) * local_m
        vs = jax.lax.all_gather(v, axis, axis=0)      # [n_dev, B, k]
        is_ = jax.lax.all_gather(i, axis, axis=0)
        b = q.shape[0]
        vs = jnp.transpose(vs, (1, 0, 2)).reshape(b, -1)
        is_ = jnp.transpose(is_, (1, 0, 2)).reshape(b, -1)
        top_v, pos = jax.lax.top_k(vs, k)
        top_i = jnp.take_along_axis(is_, pos, axis=1)
        return top_v, top_i

    return run(q_emb, index.head_repr, index.rel_repr, index.tail_repr, index.struct_raw)


def score_all(
    bundle: dict[str, Any],
    q_emb: jax.Array,
    index: TripleIndex,
    *,
    chunk: int = 2048,
    bidirectional: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """[B, M] dense scores (for parity tests / recall evaluation)."""
    feats = bundle["features"]
    m = index.num_candidates
    s_dim = index.struct_raw.shape[-1] // 2

    def one_query(q_row):
        _, gate, bias = _query_context(feats, q_row)
        fwd = _score_chunk(
            feats, gate, bias, index.head_repr, index.rel_repr, index.tail_repr,
            index.struct_raw, dtype=dtype,
        )
        if not bidirectional:
            return fwd
        s_swap = jnp.concatenate(
            [index.struct_raw[:, s_dim:], index.struct_raw[:, :s_dim]], axis=-1
        )
        bwd = _score_chunk(
            feats, gate, bias, index.tail_repr, index.rel_repr, index.head_repr,
            s_swap, dtype=dtype,
        )
        stacked = jnp.stack([fwd, bwd])
        w = jax.nn.softmax(stacked, axis=0)
        return jnp.sum(w * stacked, axis=0)

    return jax.vmap(one_query)(q_emb)
