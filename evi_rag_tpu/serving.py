"""Split-serving engine: trained retriever -> pre-projected tables -> batched
per-question top-k.

The north-star product surface (BASELINE.json): the trained retriever becomes
an index-and-query engine.  At index build time the entity/relation embedding
tables are pushed through the frozen projectors **once per checkpoint**
(reference: the per-batch ``EmbeddingProjector`` forward inside
``src/models/components/retriever.py:403-451`` re-projects every edge
occurrence on every batch); per query only the question-conditioned geometry
+ MLP head run.  Per-question struct features (topic-anchored DDE,
``retriever.py:519-553``) are parameter-free and recomputed on device from
topology alone, exactly as in training -- serving scores equal
``Retriever.apply`` logits (see ``tests/test_serving_parity.py``).

Questions are grouped into power-of-two edge-count buckets (one compiled
program per bucket shape, XLA static-shape discipline) and scored with the
batched ``ops.query.query_topk_per_question`` path, keeping the
``[G*M, D]x[D, H]`` matmuls MXU-shaped.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from evi_rag_tpu.data.sample import RetrievalSample
from evi_rag_tpu.models.dde import build_node_struct_features
from evi_rag_tpu.ops.nnfn import projector as _projector
from evi_rag_tpu.ops.query import query_topk_per_question


def project_tables(
    bundle: dict[str, Any],
    entity_emb: np.ndarray,     # [V, D] raw text embeddings (row 0 = non-text)
    relation_emb: np.ndarray,   # [R, D]
    *,
    chunk: int = 65536,
) -> tuple[np.ndarray, np.ndarray]:
    """Apply the frozen projectors to the full vocab once (index build).

    Returns host-side float32 tables; row 0 of the entity table is replaced
    by the learned non-text entity row, matching the embedding-table row-0
    reservation (reference ``text_encode_utils.py:70-112`` row-0 contract and
    ``retriever.py:130-133`` non_text_entity_emb).
    """
    feats = bundle["features"]
    ent_proj = jax.jit(lambda x: _projector(feats["entity_proj"], x))
    parts = []
    for i in range(0, entity_emb.shape[0], chunk):
        rows = np.asarray(entity_emb[i : i + chunk], dtype=np.float32)
        parts.append(np.asarray(ent_proj(jnp.asarray(rows))))
    ent = np.concatenate(parts, axis=0)
    non_text = np.asarray(
        _projector(feats["entity_proj"], feats["non_text_entity_emb"][None, :])
    )[0]
    ent[0] = non_text
    rel = np.asarray(
        jax.jit(lambda x: _projector(feats["relation_proj"], x))(
            jnp.asarray(np.asarray(relation_emb, dtype=np.float32))
        )
    )
    return ent, rel


def _serve_group_impl(
    bundle, q_emb, ent_table, rel_table, head_rows, rel_ids, tail_rows,
    topic_one_hot, edge_index, edge_mask, *, k, num_rounds, num_reverse_rounds,
    dtype=jnp.bfloat16,
):
    """Traceable body shared by ``serve_group`` and ``serve_window``."""
    head_repr = ent_table[head_rows]
    rel_repr = rel_table[rel_ids]
    tail_repr = ent_table[tail_rows]

    def struct_of(t, ei, em):
        ns = build_node_struct_features(
            t, ei, num_rounds=num_rounds,
            num_reverse_rounds=num_reverse_rounds, edge_mask=em,
        )
        return jnp.concatenate([ns[ei[0]], ns[ei[1]]], axis=-1)

    struct_raw = jax.vmap(struct_of)(topic_one_hot, edge_index, edge_mask)
    return query_topk_per_question(
        bundle, q_emb, head_repr, rel_repr, tail_repr, struct_raw, edge_mask,
        k=k, dtype=dtype,
    )


@partial(
    jax.jit,
    static_argnames=("k", "num_rounds", "num_reverse_rounds", "dtype",
                     "use_fused", "interpret"),
)
def serve_window(
    bundle: dict[str, Any],
    q_table: jax.Array,        # [Q, D] device-resident question embeddings
    ent_table: jax.Array,      # [V, D]
    rel_table: jax.Array,      # [R, D]
    edge_index: jax.Array,     # [B, G, 2, M] local node ids (int16|int32)
    node_rows: jax.Array,      # [B, G, N] int32 entity-table rows per node
    rel_ids: jax.Array,        # [B, G, M] relation rows (int16|int32)
    lengths: jax.Array,        # [B, G] int32 valid edge counts (prefix mask)
    topic_flags: jax.Array,    # [B, G, N] uint8 (1 = topic/seed node)
    node_counts: jax.Array,    # [B, G] int32 valid node counts
    qids: jax.Array,           # [B, G] int32 rows into q_table
    *,
    k: int,
    num_rounds: int,
    num_reverse_rounds: int,
    dtype=jnp.bfloat16,
    use_fused: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One dispatched computation for a whole BUCKET of groups.

    ``lax.map`` runs the per-group serving step sequentially on device
    (memory stays O(one group)); on remote-attached TPUs this collapses the
    per-group dispatch RPCs -- measured dominant over compute for
    small-subgraph splits -- into one execute per bucket.  The feed is
    byte-minimal (the other tunnel bottleneck): int16 local edge ids +
    per-node table rows expanded to per-edge rows ON DEVICE, prefix lengths
    instead of masks, uint8 topic flags instead of the one-hot.
    """
    m = edge_index.shape[-1]
    n = node_rows.shape[-1]

    def body(u):
        eidx16, nrows, ri16, lens, tflags, ncnt, qg = u
        q = q_table[qg]
        eidx = eidx16.astype(jnp.int32)
        ri = ri16.astype(jnp.int32)
        emask = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) < lens[:, None]
        hr = jnp.take_along_axis(nrows, eidx[:, 0, :], axis=1)
        tr = jnp.take_along_axis(nrows, eidx[:, 1, :], axis=1)
        nvalid = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < ncnt[:, None]
        t0 = tflags.astype(jnp.float32)
        topic = jnp.stack([t0, (nvalid & (tflags == 0)).astype(jnp.float32)], axis=-1)
        if use_fused:
            from evi_rag_tpu.ops.pallas_score import pallas_per_question_topk

            head_repr = ent_table[hr]
            rel_repr = rel_table[ri]
            tail_repr = ent_table[tr]

            def struct_of(t, ei, em):
                ns = build_node_struct_features(
                    t, ei, num_rounds=num_rounds,
                    num_reverse_rounds=num_reverse_rounds, edge_mask=em,
                )
                return jnp.concatenate([ns[ei[0]], ns[ei[1]]], axis=-1)

            struct_raw = jax.vmap(struct_of)(topic, eidx, emask)
            return pallas_per_question_topk(
                bundle, q, head_repr, rel_repr, tail_repr, struct_raw, emask,
                k=k, interpret=interpret,
            )
        return _serve_group_impl(
            bundle, q, ent_table, rel_table, hr, ri, tr, topic, eidx, emask,
            k=k, num_rounds=num_rounds,
            num_reverse_rounds=num_reverse_rounds, dtype=dtype,
        )

    return jax.lax.map(
        body,
        (edge_index, node_rows, rel_ids, lengths, topic_flags, node_counts, qids),
    )


@partial(jax.jit, static_argnames=("k", "num_rounds", "num_reverse_rounds", "dtype"))
def serve_group(
    bundle: dict[str, Any],
    q_emb: jax.Array,          # [G, D]
    ent_table: jax.Array,      # [V, D] device-resident projected entity table
    rel_table: jax.Array,      # [R, D] device-resident projected relation table
    head_rows: jax.Array,      # [G, M] int32 entity-table rows (padding -> 0)
    rel_ids: jax.Array,        # [G, M] int32 relation-table rows
    tail_rows: jax.Array,      # [G, M] int32
    topic_one_hot: jax.Array,  # [G, N, 2]
    edge_index: jax.Array,     # [G, 2, M] local node ids (padding -> node N-1)
    edge_mask: jax.Array,      # [G, M] bool
    *,
    k: int,
    num_rounds: int,
    num_reverse_rounds: int,
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """One compiled serving step for a bucket of questions: on-device row
    gather from the resident tables + DDE struct rebuild + batched score +
    per-question top-k.

    Only integer ids cross the host->device link per group (the projected
    tables upload once per checkpoint) -- the dense [G, M, D] candidate
    tensors are gathered on device.
    """
    return _serve_group_impl(
        bundle, q_emb, ent_table, rel_table, head_rows, rel_ids, tail_rows,
        topic_one_hot, edge_index, edge_mask,
        k=k, num_rounds=num_rounds, num_reverse_rounds=num_reverse_rounds,
        dtype=dtype,
    )


@partial(jax.jit, static_argnames=("k", "num_rounds", "num_reverse_rounds", "interpret"))
def serve_group_fused(
    bundle: dict[str, Any],
    q_emb: jax.Array,
    ent_table: jax.Array,
    rel_table: jax.Array,
    head_rows: jax.Array,
    rel_ids: jax.Array,
    tail_rows: jax.Array,
    topic_one_hot: jax.Array,
    edge_index: jax.Array,
    edge_mask: jax.Array,
    *,
    k: int,
    num_rounds: int,
    num_reverse_rounds: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused-kernel serving step for large per-question buckets: same row
    gather + DDE rebuild as :func:`serve_group`, but scoring + selection run
    in the streaming Pallas kernel (``ops.pallas_score.
    pallas_per_question_topk``) -- no [G, M] score materialization, top-k in
    VMEM.  Exactness vs the XLA path is covered by tests."""
    from evi_rag_tpu.ops.pallas_score import pallas_per_question_topk

    head_repr = ent_table[head_rows]
    rel_repr = rel_table[rel_ids]
    tail_repr = ent_table[tail_rows]

    def struct_of(t, ei, em):
        ns = build_node_struct_features(
            t, ei, num_rounds=num_rounds,
            num_reverse_rounds=num_reverse_rounds, edge_mask=em,
        )
        return jnp.concatenate([ns[ei[0]], ns[ei[1]]], axis=-1)

    struct_raw = jax.vmap(struct_of)(topic_one_hot, edge_index, edge_mask)
    return pallas_per_question_topk(
        bundle, q_emb, head_repr, rel_repr, tail_repr, struct_raw, edge_mask,
        k=k, interpret=interpret,
    )


@dataclasses.dataclass
class ServeResult:
    sample_id: str
    question_id: int
    edge_ids: np.ndarray    # [k'] local candidate edge ids, rank order
    scores: np.ndarray      # [k'] f32


@dataclasses.dataclass
class ServeStats:
    num_questions: int
    index_build_s: float
    scoring_s: float
    queries_per_s: float
    num_groups: int
    # Phase breakdown (VERDICT r2 #1c): host packing time, dispatch-loop wall
    # (pack + H2D enqueue + async kernel dispatch) and drain wall (blocking
    # D2H of the [G, k] results after the device ran ahead).  pack_s is a
    # subset of dispatch_s; compute overlaps both.
    pack_s: float = 0.0
    dispatch_s: float = 0.0
    drain_s: float = 0.0
    # One-time remote-compile wall for this split's bucket shapes (warmup
    # pass).  queries_per_s measures steady-state (post-warmup) throughput —
    # the production-server operating point; a cold first request pays
    # compile_s once per new shape.
    compile_s: float = 0.0
    num_windows: int = 0


def _pow2_at_least(n: int, lo: int = 8) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def serve_split(
    bundle: dict[str, Any],
    samples: Sequence[RetrievalSample],
    *,
    entity_emb: np.ndarray,
    relation_emb: np.ndarray,
    question_emb: np.ndarray,
    k: int,
    num_rounds: int,
    num_reverse_rounds: int,
    group_size: int = 16,
    dtype=jnp.bfloat16,
    projected: tuple[np.ndarray, np.ndarray] | None = None,
    mesh=None,
    fused_threshold: int = 256,
    fused_interpret: bool | None = None,
    warmup: bool | None = None,
) -> tuple[list[ServeResult], ServeStats]:
    """Serve every question of a split through the engine.

    Samples are sorted by edge count and grouped ``group_size`` at a time
    into pow-2 padded buckets; results are returned in the original order.
    ``projected`` lets callers reuse ``project_tables`` output across splits.
    With ``mesh``, the question axis of every group is sharded over the mesh
    (data-parallel serving: per-question scoring has no cross-question
    communication, so DP is the natural multi-chip serving axis); groups pad
    up to a multiple of the device count with empty questions.
    """
    t0 = time.perf_counter()
    if projected is None:
        projected = project_tables(bundle, entity_emb, relation_emb)
    ent_t, rel_t = projected
    # Tables upload once per call (once per checkpoint via ``projected``
    # reuse); per window only small integer feeds cross the link.
    put_table = jnp.asarray
    win_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        group_size = -(-group_size // n_dev) * n_dev
        repl = NamedSharding(mesh, P())
        put_table = lambda x: jax.device_put(jnp.asarray(x), repl)
        # Window feeds are [B, G, ...]: shard the QUESTION axis (per-question
        # scoring has no cross-question communication, so DP is the natural
        # serving axis); lax.map walks the bucket axis sequentially.
        win_sh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
    ent_t_dev = put_table(np.ascontiguousarray(ent_t))
    rel_t_dev = put_table(np.ascontiguousarray(rel_t))
    jax.block_until_ready(ent_t_dev)
    index_build_s = time.perf_counter() - t0

    def put_win(x: np.ndarray):
        # device_put straight from host numpy: jnp.asarray first would
        # commit to device 0 and pay a second device-to-device scatter.
        return jax.device_put(x, win_sh) if win_sh is not None else jnp.asarray(x)

    order = sorted(range(len(samples)), key=lambda i: samples[i].edge_index.shape[1])
    results: list[ServeResult | None] = [None] * len(samples)

    def drain(entry) -> None:
        idxs, group, vals, ids = entry
        vals_np = np.asarray(vals)  # blocks until the device result lands
        ids_np = np.asarray(ids)
        for g, (i, s) in enumerate(zip(idxs, group)):
            keep = np.isfinite(vals_np[g])
            results[i] = ServeResult(
                sample_id=s.sample_id,
                question_id=s.question_id,
                edge_ids=ids_np[g][keep],
                scores=vals_np[g][keep].astype(np.float32),
            )

    t1 = time.perf_counter()
    num_groups = 0
    pack_s = 0.0
    dispatch_s = drain_s = 0.0

    # Unified windowed path (single-device AND DP mesh).  On remote-attached
    # TPUs the wall clock is dominated by per-RPC latency (measured: a
    # 256-question split whose compute is <100 ms spent seconds on per-group
    # feeds and per-op dispatches), so the whole split runs as:
    # (a) groups sharing a padded bucket shape stack into ONE contiguous
    #     [B, G, ...] upload per field,
    # (b) ONE dispatched ``serve_window`` computation per bucket
    #     (``lax.map`` over its groups; question table device-resident,
    #     groups carry int32 question ids only),
    # (c) ONE [B, G, k] result fetch per bucket.
    # With ``mesh`` the feeds shard their question axis (``win_sh``) and XLA
    # partitions the same program over the devices -- multi-chip serving
    # inherits the RPC-collapse + byte-minimal feeds for free.
    # Windows bound device memory for very large splits -- by ESTIMATED
    # STAGED BYTES (not sample count: a window of uniformly wide-m_pad
    # samples would otherwise stack multi-GB feeds on device; ADVICE r3).
    # Pad the question-table rows up to a FIXED floor (pow-2 above it): the
    # row count enters the jit signature, so per-split row counts recompiled
    # every bucket shape per split (measured: a second split re-paid ~53 s of
    # remote compiles).  With the floor, every split <= the floor shares one
    # compiled shape set; the padded upload (~16 MB at 4096 x 1024 f32) is
    # index-build cost, not per-query cost.
    q_np = np.ascontiguousarray(question_emb.astype(np.float32))
    q_rows = max(
        _pow2_at_least(max(q_np.shape[0], 1)),
        int(os.environ.get("EVI_SERVE_QROWS_MIN", 4096)),
    )
    if q_rows != q_np.shape[0]:
        q_np = np.concatenate(
            [q_np, np.zeros((q_rows - q_np.shape[0], q_np.shape[1]), np.float32)]
        )
    q_table = put_table(q_np)
    max_window_samples = group_size * max(8, 8192 // max(group_size, 1))
    byte_budget = int(os.environ.get("EVI_SERVE_WINDOW_BYTES", 256 << 20))
    interp = (
        fused_interpret if fused_interpret is not None
        else jax.default_backend() == "cpu"
    )
    rel_dtype = np.int16 if relation_emb.shape[0] <= 32767 else np.int32

    def pack_group_compact(group, G, m_pad, n_pad):
        """Byte-minimal feed for one group (local ids; rows expand to
        per-edge entity-table rows on device)."""
        eidx_dtype = np.int16 if n_pad <= 32768 else np.int32
        eidx = np.full((G, 2, m_pad), n_pad - 1, eidx_dtype)
        node_rows = np.zeros((G, n_pad), np.int32)
        rel_ids = np.zeros((G, m_pad), rel_dtype)
        lengths = np.zeros(G, np.int32)
        topic = np.zeros((G, n_pad), np.uint8)
        ncnt = np.zeros(G, np.int32)
        qids = np.zeros(G, np.int32)
        for g, s in enumerate(group):
            e = s.edge_index.shape[1]
            eidx[g, :, :e] = s.edge_index
            node_rows[g, : s.num_nodes] = s.node_embedding_ids
            rel_ids[g, :e] = s.edge_relations
            lengths[g] = e
            topic[g, s.topic_locals] = 1
            ncnt[g] = s.num_nodes
            qids[g] = s.question_id
        return dict(eidx=eidx, node_rows=node_rows, rel_ids=rel_ids,
                    lengths=lengths, topic=topic, ncnt=ncnt, qids=qids)

    # Group boundaries + padded shapes first, then cut windows greedily
    # where the staged-feed estimate would exceed the byte budget.
    # ONE shape axis: n_pad rides the edge ladder (n_pad = m_pad >= nodes+1,
    # since m_pad already covers pow2(nodes+1)).  Independent pow-2 node
    # padding multiplied the compiled-shape count ~2-3x per width; at WebQSP
    # scale remote compiles dominated the split wall (dispatch_s 80 of 84 s).
    group_recs = []
    for g0 in range(0, len(order), group_size):
        idxs = order[g0 : g0 + group_size]
        group = [samples[i] for i in idxs]
        m_pad = _pow2_at_least(max(max(s.edge_index.shape[1], 1) for s in group))
        m_pad = max(m_pad, _pow2_at_least(k))
        m_pad = max(m_pad, _pow2_at_least(max(s.num_nodes for s in group) + 1))
        n_pad = m_pad
        eidx_isz = 2 if n_pad <= 32768 else 4
        bytes_est = group_size * (
            2 * m_pad * eidx_isz                       # eidx [2, m_pad]
            + m_pad * np.dtype(rel_dtype).itemsize     # rel_ids
            + n_pad * 4 + n_pad                        # node_rows + topic
        )
        group_recs.append((idxs, group, (m_pad, n_pad), bytes_est))
    windows: list[list[tuple]] = []
    cur: list[tuple] = []
    cur_bytes = cur_samples = 0
    for rec in group_recs:
        if cur and (
            cur_bytes + rec[3] > byte_budget
            or cur_samples + group_size > max_window_samples
        ):
            windows.append(cur)
            cur, cur_bytes, cur_samples = [], 0, 0
        cur.append(rec)
        cur_bytes += rec[3]
        cur_samples += group_size
    if cur:
        windows.append(cur)

    # Dispatch-width ladder: full chunks of B_LARGE groups ride one big
    # launch; the remainder goes in B_SMALL chunks (padding < B_SMALL).  Each
    # (bucket, B) pair compiles once ever; at WebQSP scale a bucket holds
    # hundreds of groups, so the big width cuts per-RPC dispatch count ~8x
    # where dispatch latency ~= scoring time (docs/serving.md).
    B_SMALL = int(os.environ.get("EVI_SERVE_B_WINDOW", 8))
    B_LARGE = max(int(os.environ.get("EVI_SERVE_B_WINDOW_MAX", 64)), B_SMALL)

    def _chunk_plan(n: int) -> list[int]:
        """Chunk capacities covering ``n`` groups: B_LARGE while full chunks
        remain, then B_SMALL, with the FINAL chunk capped at the pow-2 above
        its actual count.  Padded groups compute at full width, so a bucket
        holding 3 real groups must not pay an 8-wide launch (measured at the
        realistic serve point: ~2.5x group-compute waste across buckets);
        pow-2 capacities keep the compiled-shape set small and reusable."""
        plan = [B_LARGE] * (n // B_LARGE)
        rem = n - B_LARGE * len(plan)
        while rem >= B_SMALL:
            plan.append(B_SMALL)
            rem -= B_SMALL
        if rem:
            plan.append(_pow2_at_least(rem))
        return plan

    def _use_fused(m_pad: int) -> bool:
        # The fused kernel computes in bf16 internally; an explicit
        # float32 request must keep the XLA scorer.  Under a mesh the
        # XLA scorer partitions over the question axis (a pallas_call
        # does not auto-partition; per-shard Pallas lives in
        # ``query_topk_sharded_fused`` for the pooled-index surface).
        # Default threshold 256 is MEASURED, not asserted: the hardware
        # sweep (scripts/measure_fused_crossover.py, docs/serving.md)
        # shows the fused path ahead at every width from 256 up
        # (1.14x at 256 -> 1.55x at 8192).
        return mesh is None and m_pad >= fused_threshold and dtype == jnp.bfloat16

    def _dispatch(key: tuple, chunk: list[dict], b_cap: int):
        """One serve_window launch for <=b_cap groups padded to exactly
        b_cap — a CONSTANT bucket axis per ladder width, so each
        (m_pad, n_pad, b_cap) compiles once ever instead of once per
        distinct pow-2 group count."""
        if len(chunk) < b_cap:
            empty = {f: np.zeros_like(v) for f, v in chunk[0].items()}
            empty["eidx"] = np.full_like(chunk[0]["eidx"], key[1] - 1)
            chunk = chunk + [empty] * (b_cap - len(chunk))
        u = {f: put_win(np.stack([a[f] for a in chunk])) for f in chunk[0]}
        return serve_window(
            bundle, q_table, ent_t_dev, rel_t_dev,
            u["eidx"], u["node_rows"], u["rel_ids"],
            u["lengths"], u["topic"], u["ncnt"], u["qids"],
            k=k, num_rounds=num_rounds,
            num_reverse_rounds=num_reverse_rounds, dtype=dtype,
            use_fused=_use_fused(key[0]), interpret=interp,
        )

    # Warmup pass: compile every distinct bucket shape on a zeros feed
    # BEFORE the timed loop (auto: skipped on CPU/interpret runs, where
    # there is no remote compile to amortize).  A production server pays
    # this once at startup; queries_per_s then reports the steady state.
    do_warmup = (not interp) if warmup is None else warmup
    compile_s = 0.0
    if do_warmup:
        tw = time.perf_counter()
        # Exactly the (bucket shape, ladder width) pairs the dispatch plan
        # will use — no speculative compiles.
        used_shapes: set[tuple] = set()
        for win_groups in windows:
            per_key: dict[tuple, int] = {}
            for _, _, key, _ in win_groups:
                per_key[key] = per_key.get(key, 0) + 1
            for key, cnt in per_key.items():
                used_shapes.update((key, b) for b in set(_chunk_plan(cnt)))
        for key, b_cap in used_shapes:
            # pack_group_compact([]) IS the empty feed (eidx -> dump node).
            v, _ = _dispatch(key, [pack_group_compact([], group_size, *key)], b_cap)
            np.asarray(v[0, 0, 0])  # fetch one element: sync incl. compile
        compile_s = time.perf_counter() - tw
        t1 = time.perf_counter()  # steady-state clock starts after warmup

    # Drain compression (VERDICT r4 #1b): the result payload is top-k ids +
    # scores ONLY, staged as ONE int32 device array per window whose D2H copy
    # is enqueued AT DISPATCH TIME (``copy_to_host_async``) so the transfer
    # rides the tunnel while the host packs / the device computes the next
    # window; the drain-side ``np.asarray`` then finds the bytes (mostly)
    # already resident.  Under bf16 compute the score plane ships as bf16
    # pairs packed into int32 lanes (600 B/question at k=100 vs 800 f32) --
    # an explicit float32 request keeps the f32 plane bit-exact.
    pack_scores_bf16 = dtype == jnp.bfloat16

    def _stage_window_payload(pend):
        chunks_meta = [
            (meta_chunk, v.shape[0], v.shape[1]) for meta_chunk, v, _ in pend
        ]
        vals = jnp.concatenate([v.reshape(-1, v.shape[-1]) for _, v, _ in pend])
        ids = jnp.concatenate(
            [i_.reshape(-1, i_.shape[-1]) for _, _, i_ in pend]
        ).astype(jnp.int32)
        kv = vals.shape[1]
        if pack_scores_bf16:
            ke = kv + (kv & 1)
            v16 = vals.astype(jnp.bfloat16)
            if ke != kv:
                v16 = jnp.pad(v16, ((0, 0), (0, ke - kv)))
            plane = jax.lax.bitcast_convert_type(
                v16.reshape(v16.shape[0], ke // 2, 2), jnp.int32
            )
        else:
            plane = jax.lax.bitcast_convert_type(
                vals.astype(jnp.float32), jnp.int32
            )
        payload = jnp.concatenate([ids, plane], axis=1)
        try:
            payload.copy_to_host_async()
        except Exception:  # pragma: no cover - backends without async copy
            pass
        return chunks_meta, payload, kv

    def drain_window(staged) -> None:
        nonlocal drain_s
        t2 = time.perf_counter()
        chunks_meta, payload, kv = staged
        arr = np.asarray(payload)  # blocks until compute + copy land
        all_i = np.ascontiguousarray(arr[:, :kv])
        plane = np.ascontiguousarray(arr[:, kv:])
        if pack_scores_bf16:
            import ml_dtypes

            all_v = (
                plane.view(np.uint16)
                .view(ml_dtypes.bfloat16)[:, :kv]
                .astype(np.float32)
            )
        else:
            all_v = plane.view(np.float32)
        off = 0
        for meta_chunk, b_pad, g_per in chunks_meta:
            for gi, (idxs, group) in enumerate(meta_chunk):
                row = off + gi * g_per
                drain((idxs, group, all_v[row : row + g_per],
                       all_i[row : row + g_per]))
            off += b_pad * g_per
        drain_s += time.perf_counter() - t2

    # One-window lookahead: window w+1 packs and dispatches (async H2D +
    # compute enqueue) BEFORE window w's blocking result fetch, so host
    # packing and uploads overlap device compute.  Peak device residency is
    # two windows of staged feeds (byte_budget bounds each).
    prev_pend = None
    for win_groups in windows:
        tp = time.perf_counter()
        packed: dict[tuple, list[dict]] = {}
        metas: dict[tuple, list[tuple]] = {}  # key -> [(idxs, group)]
        for idxs, group, key, _ in win_groups:
            # Fixed G = group_size: one compiled shape per bucket; the
            # trailing partial group pads with empty questions.
            packed.setdefault(key, []).append(
                pack_group_compact(group, group_size, *key)
            )
            metas.setdefault(key, []).append((idxs, group))
        pack_s += time.perf_counter() - tp

        td = time.perf_counter()
        pend = []  # (metas_chunk, vals, ids) per dispatched chunk
        for key, lst in packed.items():
            c0 = 0
            for b_cap in _chunk_plan(len(lst)):
                chunk = lst[c0 : c0 + b_cap]
                vals, ids = _dispatch(key, chunk, b_cap)
                pend.append((metas[key][c0 : c0 + b_cap], vals, ids))
                c0 += b_cap
            num_groups += len(metas[key])
        staged = _stage_window_payload(pend)
        dispatch_s += time.perf_counter() - td

        if prev_pend is not None:
            drain_window(prev_pend)
        prev_pend = staged
    if prev_pend is not None:
        drain_window(prev_pend)

    scoring_s = time.perf_counter() - t1
    out = [r for r in results if r is not None]
    stats = ServeStats(
        num_questions=len(out),
        index_build_s=round(index_build_s, 4),
        scoring_s=round(scoring_s, 4),
        queries_per_s=round(len(out) / scoring_s, 2) if scoring_s > 0 else 0.0,
        num_groups=num_groups,
        pack_s=round(pack_s, 4),
        dispatch_s=round(dispatch_s, 4),
        drain_s=round(drain_s, 4),
        compile_s=round(compile_s, 4),
        num_windows=len(windows),
    )
    return out, stats


def serve_recall_at_k(
    samples: Sequence[RetrievalSample],
    results: Iterable[ServeResult],
    k_values: Sequence[int],
    *,
    require_positive: bool = False,
) -> dict[str, float]:
    """Triple recall@k of the served rankings against ``edge_labels`` (the
    matched-recall half of the north star).

    Reference semantics (``src/metrics/retriever_metrics.py:125-158`` and
    this repo's ``edge_recall_at_k``): zero-positive questions count as
    recall 0 in the denominator, while zero-EDGE questions are skipped from
    it entirely (the reference ``continue``s empty edge slices before the
    graph count increments) — so serve/recall@k stays directly comparable
    to eval_retriever's edge/recall@k on splits with unanswerable questions.
    ``require_positive=True`` restores the drop-from-denominator variant.
    """
    by_id = {s.sample_id: s for s in samples}
    totals = {k: 0.0 for k in k_values}
    counted = 0
    for r in results:
        s = by_id[r.sample_id]
        if s.edge_index.shape[1] == 0:
            continue  # edgeless: not in the reference denominator
        pos = np.nonzero(np.asarray(s.edge_labels) > 0.5)[0]
        if pos.size == 0:
            if not require_positive:
                counted += 1  # recall 0 for every k, reference protocol
            continue
        counted += 1
        for k in k_values:
            hit = np.intersect1d(r.edge_ids[:k], pos).size
            totals[k] += hit / pos.size
    if counted == 0:
        return {f"serve/recall@{k}": 0.0 for k in k_values}
    return {f"serve/recall@{k}": round(totals[k] / counted, 6) for k in k_values}
