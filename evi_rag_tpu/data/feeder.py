"""Bucketed batch collation: samples -> padded device batches.

Replaces the reference's ``RetrievalCollater``/``UnifiedDataLoader``
(``src/data/components/loader.py:22-186``): PyG ragged collation + worker-side
embedding gather become (a) deterministic bucket selection so XLA sees few
distinct shapes, and (b) numpy embedding gathers from the memory-mapped
global store before the batch is shipped to device -- the device step is pure
compute, exactly the property the reference engineered on the CPU side.

Bucket policy: total node/edge counts are rounded up to the next power-of-two
(times a base granularity), and one graph slot is reserved for the padding
graph.  A steady-state training run touches only a handful of buckets =>
a handful of compiled programs.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from evi_rag_tpu.data.g_agent import AgentSample
from evi_rag_tpu.data.sample import RetrievalSample as SyntheticSample
from evi_rag_tpu.models.batches import AgentBatch, PairSupervision, RetrieverBatch
from evi_rag_tpu.ops.graph import pad_graphs


def prefetch(iterator, *, size: int = 2):
    """Background-thread prefetch: overlap host collation with device compute.

    The reference gets this overlap from multi-worker DataLoaders
    (``loader.py:102-164``); here a single daemon thread keeps ``size``
    collated batches in flight, which saturates the one-batch-ahead need of
    an accelerator-bound training loop.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def round_up_pow2(x: int, base: int = 128) -> int:
    """Round up to base * 2^k (>= base)."""
    if x <= base:
        return base
    k = int(np.ceil(np.log2(x / base)))
    return base * (1 << k)


@dataclasses.dataclass(frozen=True)
class Bucket:
    graphs: int
    nodes: int
    edges: int
    pairs: int = 0

    @staticmethod
    def for_batch(
        num_graphs: int,
        total_nodes: int,
        total_edges: int,
        total_pairs: int = 0,
        *,
        node_base: int = 128,
        edge_base: int = 512,
        pair_base: int = 64,
    ) -> "Bucket":
        return Bucket(
            graphs=num_graphs + 1,  # +1 reserved padding graph slot
            nodes=round_up_pow2(total_nodes + 1, node_base),
            edges=round_up_pow2(total_edges + 1, edge_base),
            pairs=round_up_pow2(max(total_pairs, 1), pair_base),
        )


def collate_retriever(
    samples: Sequence[SyntheticSample],
    *,
    entity_emb: np.ndarray,
    relation_emb: np.ndarray,
    question_emb: np.ndarray,
    bucket: Bucket,
    with_pairs: bool = False,
    id_feed: bool = False,
) -> RetrieverBatch | tuple[RetrieverBatch, PairSupervision]:
    """Gather embeddings + pack one padded RetrieverBatch (host-side numpy).

    ``id_feed=True`` skips the dense host gathers and emits int32 table rows
    instead (``node_rows``/``edge_rows``; padding rows point at the tables'
    zero pad row) -- the step materializes them on device from a resident
    ``EmbedTables``, so only ~KBs of ids cross the host->device link per
    batch instead of the [E, D] float gathers (O(GB/step) at WebQSP scale
    over a remote-attached chip)."""
    G, N, E = bucket.graphs, bucket.nodes, bucket.edges
    pad_graph = G - 1

    gb = pad_graphs(
        edge_index=[s.edge_index for s in samples],
        num_nodes=[s.num_nodes for s in samples],
        bucket_graphs=G,
        bucket_nodes=N,
        bucket_edges=E,
    )

    if id_feed:
        node_rows = np.full(N, entity_emb.shape[0], dtype=np.int32)
        edge_rows = np.full(E, relation_emb.shape[0], dtype=np.int32)
        node_emb = edge_emb = None
    else:
        node_emb = np.zeros((N, entity_emb.shape[1]), dtype=np.float32)
        edge_emb = np.zeros((E, relation_emb.shape[1]), dtype=np.float32)
        node_rows = edge_rows = None
    node_is_nontext = np.zeros(N, dtype=bool)
    topic_one_hot = np.zeros((N, 2), dtype=np.float32)
    node_is_q = np.zeros(N, dtype=bool)
    node_is_a = np.zeros(N, dtype=bool)
    edge_labels = np.zeros(E, dtype=np.float32)
    q_emb = np.zeros((G, question_emb.shape[1]), dtype=np.float32)

    n_off = 0
    e_off = 0
    for g, s in enumerate(samples):
        nn, ne = s.num_nodes, s.edge_index.shape[1]
        ids = s.node_embedding_ids
        if id_feed:
            node_rows[n_off : n_off + nn] = ids
            edge_rows[e_off : e_off + ne] = s.edge_relations
        else:
            node_emb[n_off : n_off + nn] = entity_emb[ids]
            edge_emb[e_off : e_off + ne] = relation_emb[s.edge_relations]
        node_is_nontext[n_off : n_off + nn] = ids == 0
        topic_one_hot[n_off + s.topic_locals, 0] = 1.0
        non_topic = np.setdiff1d(np.arange(nn), s.topic_locals)
        topic_one_hot[n_off + non_topic, 1] = 1.0
        node_is_q[n_off + s.topic_locals] = True
        node_is_a[n_off + s.answer_locals] = True
        edge_labels[e_off : e_off + ne] = s.edge_labels.astype(np.float32)
        q_emb[g] = question_emb[s.question_id]
        n_off += nn
        e_off += ne

    batch = RetrieverBatch(
        graph=gb,
        node_emb=None if id_feed else jnp.asarray(node_emb),
        node_is_nontext=jnp.asarray(node_is_nontext),
        edge_emb=None if id_feed else jnp.asarray(edge_emb),
        question_emb=jnp.asarray(q_emb),
        topic_one_hot=jnp.asarray(topic_one_hot),
        edge_labels=jnp.asarray(edge_labels),
        node_is_q=jnp.asarray(node_is_q),
        node_is_a=jnp.asarray(node_is_a),
        node_rows=jnp.asarray(node_rows) if id_feed else None,
        edge_rows=jnp.asarray(edge_rows) if id_feed else None,
    )
    if not with_pairs:
        return batch

    P = bucket.pairs
    pair_batch = np.full(P, pad_graph, dtype=np.int32)
    pair_start = np.zeros(P, dtype=np.int32)
    pair_answer = np.zeros(P, dtype=np.int32)
    pair_len = np.zeros(P, dtype=np.int32)
    pair_mask = np.zeros(P, dtype=bool)
    p_off = 0
    for g, s in enumerate(samples):
        np_pairs = s.pair_start_local.shape[0]
        if p_off + np_pairs > P:
            raise ValueError(f"pair bucket overflow: {p_off + np_pairs} > {P}")
        sl = slice(p_off, p_off + np_pairs)
        pair_batch[sl] = g
        pair_start[sl] = s.pair_start_local
        pair_answer[sl] = s.pair_answer_local
        pair_len[sl] = s.pair_shortest_len
        pair_mask[sl] = True
        p_off += np_pairs
    pairs = PairSupervision(
        pair_batch=jnp.asarray(pair_batch),
        pair_start_local=jnp.asarray(pair_start),
        pair_answer_local=jnp.asarray(pair_answer),
        pair_shortest_len=jnp.asarray(pair_len),
        pair_mask=jnp.asarray(pair_mask),
    )
    return batch, pairs


def iter_retriever_batches(
    samples: Sequence[SyntheticSample],
    *,
    entity_emb: np.ndarray,
    relation_emb: np.ndarray,
    question_emb: np.ndarray,
    batch_size: int,
    bucket: Bucket | None = None,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
) -> Iterator[RetrieverBatch]:
    """Yield padded batches; a fixed global bucket keeps one compiled shape."""
    order = np.arange(len(samples))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    if bucket is None:
        bucket = fixed_bucket_for(samples, batch_size)
    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        if drop_last and idx.size < batch_size:
            break
        chunk = [samples[j] for j in idx]
        yield collate_retriever(
            chunk,
            entity_emb=entity_emb,
            relation_emb=relation_emb,
            question_emb=question_emb,
            bucket=bucket,
        )


def collate_agent(
    samples: Sequence[AgentSample],
    *,
    entity_emb: np.ndarray,
    relation_emb: np.ndarray,
    question_emb: np.ndarray,
    bucket: Bucket,
    id_feed: bool = False,
) -> AgentBatch:
    """Pack agent samples into one padded AgentBatch (GFlowNet env input).

    ``id_feed``: see ``collate_retriever`` -- int32 table rows instead of
    dense embedding gathers, materialized on device inside the jitted step."""
    G, N, E, P = bucket.graphs, bucket.nodes, bucket.edges, bucket.pairs
    pad_graph = G - 1

    gb = pad_graphs(
        edge_index=[
            np.stack([s.edge_head_locals, s.edge_tail_locals]).astype(np.int32) for s in samples
        ],
        num_nodes=[s.num_nodes for s in samples],
        bucket_graphs=G,
        bucket_nodes=N,
        bucket_edges=E,
    )

    d = entity_emb.shape[1]
    if id_feed:
        node_rows = np.full(N, entity_emb.shape[0], dtype=np.int32)
        edge_rows = np.full(E, relation_emb.shape[0], dtype=np.int32)
        node_emb = edge_emb = None
    else:
        node_emb = np.zeros((N, d), dtype=np.float32)
        edge_emb = np.zeros((E, relation_emb.shape[1]), dtype=np.float32)
        node_rows = edge_rows = None
    node_is_nontext = np.zeros(N, dtype=bool)
    node_is_start = np.zeros(N, dtype=bool)
    node_is_answer = np.zeros(N, dtype=bool)
    edge_scores = np.zeros(E, dtype=np.float32)
    edge_relations = np.zeros(E, dtype=np.int32)
    edge_labels = np.zeros(E, dtype=np.float32)
    q_emb = np.zeros((G, question_emb.shape[1]), dtype=np.float32)
    is_dummy = np.zeros(G, dtype=bool)

    pair_batch = np.full(P, pad_graph, dtype=np.int32)
    pair_start = np.zeros(P, dtype=np.int32)
    pair_answer = np.zeros(P, dtype=np.int32)
    pair_len = np.zeros(P, dtype=np.int32)
    pair_mask = np.zeros(P, dtype=bool)

    n_off = e_off = p_off = 0
    for g, s in enumerate(samples):
        nn, ne = s.num_nodes, s.num_edges
        ids = s.node_embedding_ids
        if id_feed:
            node_rows[n_off : n_off + nn] = ids
            edge_rows[e_off : e_off + ne] = s.edge_relations
        else:
            node_emb[n_off : n_off + nn] = entity_emb[ids]
            edge_emb[e_off : e_off + ne] = relation_emb[s.edge_relations]
        node_is_nontext[n_off : n_off + nn] = ids == 0
        node_is_start[n_off + s.start_node_locals] = True
        node_is_answer[n_off + s.answer_node_locals] = True
        edge_scores[e_off : e_off + ne] = s.edge_scores
        edge_relations[e_off : e_off + ne] = s.edge_relations
        edge_labels[e_off : e_off + ne] = s.edge_labels
        q_emb[g] = question_emb[s.question_id]
        is_dummy[g] = s.is_dummy_agent
        npair = s.pair_start_local.shape[0]
        if p_off + npair > P:
            raise ValueError(f"pair bucket overflow: {p_off + npair} > {P}")
        sl = slice(p_off, p_off + npair)
        pair_batch[sl] = g
        pair_start[sl] = s.pair_start_local
        pair_answer[sl] = s.pair_answer_local
        pair_len[sl] = s.pair_shortest_len
        pair_mask[sl] = True
        n_off += nn
        e_off += ne
        p_off += npair

    return AgentBatch(
        graph=gb,
        edge_scores=jnp.asarray(edge_scores),
        edge_relations=jnp.asarray(edge_relations),
        node_emb=None if id_feed else jnp.asarray(node_emb),
        node_is_nontext=jnp.asarray(node_is_nontext),
        edge_emb=None if id_feed else jnp.asarray(edge_emb),
        question_emb=jnp.asarray(q_emb),
        node_is_start=jnp.asarray(node_is_start),
        node_is_answer=jnp.asarray(node_is_answer),
        is_dummy=jnp.asarray(is_dummy),
        edge_labels=jnp.asarray(edge_labels),
        pairs=PairSupervision(
            pair_batch=jnp.asarray(pair_batch),
            pair_start_local=jnp.asarray(pair_start),
            pair_answer_local=jnp.asarray(pair_answer),
            pair_shortest_len=jnp.asarray(pair_len),
            pair_mask=jnp.asarray(pair_mask),
        ),
        node_rows=jnp.asarray(node_rows) if id_feed else None,
        edge_rows=jnp.asarray(edge_rows) if id_feed else None,
    )


def collate_agent_stacked(
    samples: Sequence[AgentSample],
    *,
    num_shards: int,
    entity_emb: np.ndarray,
    relation_emb: np.ndarray,
    question_emb: np.ndarray,
    bucket: Bucket,
    id_feed: bool = False,
) -> AgentBatch:
    """Stacked data-parallel agent collation (``[D, ...]`` leading axis)."""
    if len(samples) % num_shards != 0:
        raise ValueError(f"{len(samples)} samples not divisible by {num_shards} shards")
    per = len(samples) // num_shards
    shards = [
        collate_agent(
            samples[i * per : (i + 1) * per],
            entity_emb=entity_emb, relation_emb=relation_emb,
            question_emb=question_emb, bucket=bucket, id_feed=id_feed,
        )
        for i in range(num_shards)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *shards)


def _worst_batch_sum(values: Sequence[int], batch_size: int) -> int:
    """Upper bound on any batch's total under ANY ordering: the sum of the
    ``batch_size`` largest samples.  Sizing buckets from contiguous windows
    races with shuffling (a shuffled batch can exceed the bucket mid-epoch);
    this bound cannot."""
    return int(sum(sorted(values, reverse=True)[:batch_size]))


def fixed_agent_bucket(samples: Sequence[AgentSample], batch_size: int) -> Bucket:
    return Bucket.for_batch(
        batch_size,
        _worst_batch_sum([s.num_nodes for s in samples], batch_size),
        _worst_batch_sum([s.num_edges for s in samples], batch_size),
        _worst_batch_sum([s.pair_start_local.shape[0] for s in samples], batch_size),
    )


def collate_stacked(
    samples: Sequence[SyntheticSample],
    *,
    num_shards: int,
    entity_emb: np.ndarray,
    relation_emb: np.ndarray,
    question_emb: np.ndarray,
    bucket: Bucket,
    id_feed: bool = False,
) -> RetrieverBatch:
    """Stacked data-parallel collation: ``[D, ...]`` leading axis, one padded
    self-contained sub-batch per mesh shard (edge indices stay shard-local,
    so no cross-device gathers are induced)."""
    if len(samples) % num_shards != 0:
        raise ValueError(f"{len(samples)} samples not divisible by {num_shards} shards")
    per = len(samples) // num_shards
    shards = [
        collate_retriever(
            samples[i * per : (i + 1) * per],
            entity_emb=entity_emb,
            relation_emb=relation_emb,
            question_emb=question_emb,
            bucket=bucket,
            id_feed=id_feed,
        )
        for i in range(num_shards)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *shards)


def iter_stacked_batches(
    samples: Sequence[SyntheticSample],
    *,
    num_shards: int,
    per_shard_batch: int,
    entity_emb: np.ndarray,
    relation_emb: np.ndarray,
    question_emb: np.ndarray,
    bucket: Bucket | None = None,
    shuffle: bool = True,
    seed: int = 0,
    id_feed: bool = False,
) -> Iterator[RetrieverBatch]:
    """Yield stacked DP batches of ``num_shards * per_shard_batch`` samples."""
    chunk = num_shards * per_shard_batch
    if bucket is None:
        bucket = fixed_bucket_for(samples, per_shard_batch)
    order = np.arange(len(samples))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    usable = (len(order) // chunk) * chunk
    for i in range(0, usable, chunk):
        idx = order[i : i + chunk]
        yield collate_stacked(
            [samples[j] for j in idx],
            num_shards=num_shards,
            entity_emb=entity_emb,
            relation_emb=relation_emb,
            question_emb=question_emb,
            bucket=bucket,
            id_feed=id_feed,
        )


def fixed_bucket_for(samples: Sequence[SyntheticSample], batch_size: int) -> Bucket:
    """One bucket covering the worst-case batch under any shuffle order =>
    exactly one compile, and no collation path can overflow mid-epoch."""
    return Bucket.for_batch(
        batch_size,
        _worst_batch_sum([s.num_nodes for s in samples], batch_size),
        _worst_batch_sum([s.edge_index.shape[1] for s in samples], batch_size),
        _worst_batch_sum([s.pair_start_local.shape[0] for s in samples], batch_size),
    )
