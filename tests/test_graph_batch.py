"""GraphBatch padding invariants: padding graph absorbs all padding, no leakage."""

import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.ops import GraphBatch, segment_sum
from evi_rag_tpu.ops.graph import pad_graphs, scatter_node_values


def _two_graphs():
    # graph 0: 3 nodes, 2 edges (0->1, 1->2); graph 1: 2 nodes, 1 edge (0->1)
    e0 = np.array([[0, 1], [1, 2]], dtype=np.int32)
    e1 = np.array([[0], [1]], dtype=np.int32)
    return pad_graphs(
        edge_index=[e0, e1],
        num_nodes=[3, 2],
        bucket_graphs=4,
        bucket_nodes=8,
        bucket_edges=6,
    )


def test_pack_layout():
    gb = _two_graphs()
    np.testing.assert_array_equal(gb.node_ptr, [0, 3, 5, 5, 8])
    np.testing.assert_array_equal(gb.edge_ptr, [0, 2, 3, 3, 6])
    np.testing.assert_array_equal(np.asarray(gb.node_batch[:5]), [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(gb.node_batch[5:]), [3, 3, 3])
    np.testing.assert_array_equal(np.asarray(gb.edge_index[:, :3]), [[0, 1, 3], [1, 2, 4]])
    np.testing.assert_array_equal(np.asarray(gb.graph_mask), [True, True, False, False])
    assert np.asarray(gb.edge_batch[3:] == 3).all()


def test_padding_edges_touch_only_padding_nodes():
    gb = _two_graphs()
    pad_edges = ~np.asarray(gb.edge_mask)
    heads = np.asarray(gb.edge_index[0])[pad_edges]
    tails = np.asarray(gb.edge_index[1])[pad_edges]
    node_mask = np.asarray(gb.node_mask)
    assert (~node_mask[heads]).all()
    assert (~node_mask[tails]).all()


def test_segment_reduction_ignores_padding_without_mask():
    gb = _two_graphs()
    ones = jnp.ones(gb.num_edges)
    per_graph = segment_sum(ones, gb.edge_batch, gb.num_graphs)
    np.testing.assert_array_equal(np.asarray(per_graph), [2.0, 1.0, 0.0, 3.0])
    # Real rows need no mask; padding lands in the reserved padding row.


def test_local_global_roundtrip():
    gb = _two_graphs()
    local = jnp.asarray([0, 1, 0], dtype=jnp.int32)
    gids = jnp.asarray([0, 0, 1], dtype=jnp.int32)
    glob = gb.local_to_global_nodes(local, gids)
    np.testing.assert_array_equal(np.asarray(glob), [0, 1, 3])
    back = gb.global_to_local_nodes(glob)
    np.testing.assert_array_equal(np.asarray(back), [0, 1, 0])


def test_bucket_overflow_raises():
    e = np.zeros((2, 0), dtype=np.int32)
    with pytest.raises(ValueError, match="graph slots"):
        pad_graphs(edge_index=[e] * 4, num_nodes=[1] * 4, bucket_graphs=4, bucket_nodes=8, bucket_edges=8)
    with pytest.raises(ValueError, match="exceed bucket_nodes"):
        pad_graphs(edge_index=[e], num_nodes=[9], bucket_graphs=4, bucket_nodes=8, bucket_edges=8)


def test_scatter_node_values():
    out = scatter_node_values([np.ones((3, 2)), np.full((2, 2), 2.0)], bucket_nodes=8)
    assert out.shape == (8, 2)
    np.testing.assert_array_equal(out[:3], 1.0)
    np.testing.assert_array_equal(out[3:5], 2.0)
    np.testing.assert_array_equal(out[5:], 0.0)


def test_profiling_helpers(tmp_path):
    """annotate/trace/device_memory_stats run without error."""
    import jax.numpy as jnp

    from evi_rag_tpu.utils.profiling import annotate, device_memory_stats, trace

    with annotate("unit-test-region"):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(x[0, 0]) == 8.0
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    with trace(tmp_path / "trace"):
        (jnp.ones((4, 4)) * 2).block_until_ready()
    assert any((tmp_path / "trace").rglob("*")), "no trace artifacts written"


def test_synthetic_multi_seed_answer():
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(
        num_samples=6, emb_dim=8, max_nodes=16, num_seeds=2, num_answers=2, seed=3
    )
    multi = [s for s in ds.samples if s.topic_locals.size > 1 and s.answer_locals.size > 1]
    assert multi, "expected multi-seed/answer samples"
    for s in ds.samples:
        s.validate()
        # Pair supervision covers every reachable (seed, answer) combination.
        assert s.pair_start_local.size >= 1
        assert s.edge_labels.any()


def test_iter_retriever_batches_shuffle_droplast():
    from evi_rag_tpu.data.feeder import Bucket, iter_retriever_batches
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_samples=10, emb_dim=8, max_nodes=10, seed=2)
    kw = dict(entity_emb=ds.entity_emb, relation_emb=ds.relation_emb, question_emb=ds.question_emb)
    bucket = Bucket(graphs=4, nodes=64, edges=256)
    batches = list(iter_retriever_batches(ds.samples, batch_size=3, bucket=bucket, **kw))
    assert len(batches) == 4  # 3+3+3+1
    batches = list(
        iter_retriever_batches(ds.samples, batch_size=3, bucket=bucket, drop_last=True, **kw)
    )
    assert len(batches) == 3
    # Shuffle with different seeds yields different orderings (question rows).
    a = next(iter(iter_retriever_batches(ds.samples, batch_size=3, bucket=bucket, shuffle=True, seed=0, **kw)))
    b = next(iter(iter_retriever_batches(ds.samples, batch_size=3, bucket=bucket, shuffle=True, seed=1, **kw)))
    assert not np.allclose(np.asarray(a.question_emb), np.asarray(b.question_emb))


def test_bucket_sizing_survives_any_shuffle():
    """fixed_bucket_for sizes from the batch_size largest samples, so no
    shuffle ordering can overflow the bucket mid-epoch (VERDICT weak #2)."""
    from evi_rag_tpu.data.feeder import fixed_bucket_for, iter_retriever_batches
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset

    # High graph-size variance: adversarial for contiguous-window sizing.
    parts = [
        make_synthetic_dataset(num_samples=8, emb_dim=8, min_nodes=3, max_nodes=5, seed=7),
        make_synthetic_dataset(num_samples=8, emb_dim=8, max_nodes=24, seed=8),
    ]
    samples = parts[0].samples + parts[1].samples
    # Reassign question ids so both halves index into one question table.
    import dataclasses as _dc

    samples = [_dc.replace(s, question_id=i, sample_id=f"s{i}") for i, s in enumerate(samples)]
    question_emb = np.concatenate([parts[0].question_emb, parts[1].question_emb])
    ent = np.concatenate([parts[0].entity_emb, parts[1].entity_emb])
    # node_embedding_ids index parts' own tables; clamp into the merged one.
    samples = [
        _dc.replace(s, node_embedding_ids=np.clip(s.node_embedding_ids, 0, ent.shape[0] - 1))
        for s in samples
    ]
    kw = dict(entity_emb=ent, relation_emb=parts[1].relation_emb, question_emb=question_emb)

    bucket = fixed_bucket_for(samples, batch_size=3)
    # Sorted-by-size order puts the largest graphs in one batch; every seed's
    # shuffle must fit too.
    for seed in range(20):
        for _ in iter_retriever_batches(
            samples, batch_size=3, bucket=bucket, shuffle=True, seed=seed, **kw
        ):
            pass
    # Worst case explicitly: the batch of the 3 largest samples collates.
    from evi_rag_tpu.data.feeder import collate_retriever

    biggest = sorted(samples, key=lambda s: -s.num_nodes)[:3]
    collate_retriever(biggest, bucket=bucket, **kw)
