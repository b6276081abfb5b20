"""Multi-device sharding: stacked-DP training step + sharded query fan-out
on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bench import build_inputs, make_bundle
from evi_rag_tpu.data.feeder import Bucket, collate_stacked
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.models.retriever import Retriever
from evi_rag_tpu.ops.query import TripleIndex, query_topk, query_topk_sharded
from evi_rag_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from evi_rag_tpu.train.retriever_trainer import (
    RetrieverTrainConfig,
    create_train_state,
    make_train_step,
)

NDEV = len(jax.devices())
pytestmark = pytest.mark.skipif(NDEV < 8, reason="needs 8 virtual devices")


def test_dp_train_step_matches_single_device():
    """The stacked-DP step over the mesh computes the same update as the
    identical step with everything on one device."""
    ds = make_synthetic_dataset(num_samples=16, emb_dim=16, max_nodes=10, seed=4)
    bucket = Bucket(graphs=3, nodes=32, edges=128)
    stacked = collate_stacked(
        ds.samples, num_shards=8,
        entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    model = Retriever(emb_dim=16, hidden_dim=16, dropout_p=0.0)
    cfg = RetrieverTrainConfig(k_values=(5,))
    state, tx = create_train_state(model, stacked, cfg, seed=0)
    step = make_train_step(model, tx, cfg)

    # Single-device baseline.
    s1, m1 = step(state, stacked)

    # Mesh-sharded run.
    mesh = make_mesh(8)
    state_sh = jax.device_put(state, replicated(mesh))
    stacked_sh = shard_batch(stacked, mesh)
    s2, m2 = step(state_sh, stacked_sh)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # psum reassociation introduces tiny float drift vs the fused single-
    # device reduction; bound it absolutely.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5)


def test_sharded_query_topk_matches_single_device():
    D, S, M, B, K = 64, 20, 1024, 4, 16
    bundle = jax.tree.map(jnp.asarray, make_bundle(D, D, S, seed=2))
    ins = build_inputs(M, D, S, B, seed=2)
    index = TripleIndex(
        head_repr=jnp.asarray(ins["head"]), rel_repr=jnp.asarray(ins["rel"]),
        tail_repr=jnp.asarray(ins["tail"]), struct_raw=jnp.asarray(ins["struct"]),
    )
    q = jnp.asarray(ins["q"])
    v_ref, i_ref = query_topk(bundle, q, index, k=K, chunk=128, dtype=jnp.float32)

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))
    index_sh = TripleIndex(
        head_repr=jax.device_put(index.head_repr, sh),
        rel_repr=jax.device_put(index.rel_repr, sh),
        tail_repr=jax.device_put(index.tail_repr, sh),
        struct_raw=jax.device_put(index.struct_raw, sh),
    )
    v_got, i_got = query_topk_sharded(
        bundle, q, index_sh, mesh=mesh, k=K, chunk=128, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref), rtol=1e-5, atol=1e-5)
    for b in range(B):
        assert set(np.asarray(i_got[b]).tolist()) == set(np.asarray(i_ref[b]).tolist())


def test_multihost_gather_single_process():
    from evi_rag_tpu.parallel.multihost import gather_records, is_main_process, main_process_only

    assert is_main_process()
    recs = [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}, {"id": 1, "v": "c"}]
    out = gather_records(recs, dedup_key=lambda r: r["id"])
    assert {r["id"]: r["v"] for r in out} == {1: "c", 2: "b"}

    calls = []

    @main_process_only
    def write():
        calls.append(1)
        return "done"

    assert write() == "done" and calls == [1]
