"""Training scorer vs serving query engine: exact score parity.

The north-star contract: a user who trains the retriever and then serves it
through the index+query engine must get the *same* triple scores.  This
builds a ``TripleIndex`` from one sample's candidates (projections
pre-applied from raw embeddings, struct features from the sample's DDE) and
checks ``score_all`` reproduces ``Retriever.apply`` logits exactly (f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# On real TPU hardware, f32 matmuls accumulate differently than the CPU
# backend (MXU passes); exactness assertions get a hardware tolerance.
import jax as _jax

_ON_TPU = _jax.default_backend() != "cpu"


from evi_rag_tpu.data.feeder import Bucket, collate_retriever
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.models.dde import build_node_struct_features
from evi_rag_tpu.models.retriever import Retriever
from evi_rag_tpu.ops.query import build_triple_index, query_topk, score_all
from evi_rag_tpu.train.checkpoint import export_retriever_features

EMB = 32


def test_training_vs_serving_scores():
    ds = make_synthetic_dataset(num_samples=2, emb_dim=EMB, max_nodes=14, seed=11)
    s = ds.samples[0]
    bucket = Bucket(graphs=2, nodes=32, edges=128)
    batch = collate_retriever(
        [s], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    train_logits = np.asarray(jax.jit(model.apply)(params, batch).logits)
    ne = s.edge_index.shape[1]

    # Serving: index build from raw tables + the exported bundle.
    bundle = export_retriever_features(params["params"], model.parity_meta())
    node_struct = build_node_struct_features(
        batch.topic_one_hot, batch.graph.edge_index,
        num_rounds=2, num_reverse_rounds=2, edge_mask=batch.graph.edge_mask,
    )
    heads_g = batch.graph.heads[:ne]
    tails_g = batch.graph.tails[:ne]
    struct_raw = jnp.concatenate([node_struct[heads_g], node_struct[tails_g]], axis=-1)
    nontext = jnp.asarray(s.node_embedding_ids == 0)
    index = build_triple_index(
        bundle,
        entity_emb=jnp.asarray(ds.entity_emb[s.node_embedding_ids]),
        relation_emb=jnp.asarray(ds.relation_emb),
        nontext_mask=nontext,
        heads=jnp.asarray(s.edge_index[0]),
        rels=jnp.asarray(s.edge_relations),
        tails=jnp.asarray(s.edge_index[1]),
        struct_raw=struct_raw,
    )
    q = jnp.asarray(ds.question_emb[s.question_id : s.question_id + 1])
    serve_logits = np.asarray(score_all(bundle, q, index, dtype=jnp.float32)[0])
    np.testing.assert_allclose(serve_logits, train_logits[:ne], rtol=5e-3 if _ON_TPU else 1e-4, atol=5e-3 if _ON_TPU else 1e-5)

    # And the streaming top-k returns the true argmax set.
    k = min(10, ne)
    vals, ids = jax.jit(
        lambda b, qq, ix: query_topk(b, qq, ix, k=k, chunk=32, dtype=jnp.float32),
        static_argnames=(),
    )(bundle, q, index)
    want_ids = np.argsort(-train_logits[:ne], kind="stable")[:k]
    assert set(np.asarray(ids[0]).tolist()) == set(want_ids.tolist())


def test_serve_split_matches_training_ranking():
    """The full split-serving engine (pre-projected tables + on-device DDE
    rebuild + batched per-question top-k) reproduces the training scorer's
    ranking for every question of a synthetic split."""
    from evi_rag_tpu.serving import serve_recall_at_k, serve_split

    ds = make_synthetic_dataset(num_samples=12, emb_dim=EMB, max_nodes=14, seed=7)
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    bucket = Bucket(graphs=2, nodes=64, edges=256)
    batch0 = collate_retriever(
        ds.samples[:1], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    params = jax.jit(model.init)(jax.random.key(3), batch0)
    bundle = export_retriever_features(params["params"], model.parity_meta())

    results, stats = serve_split(
        bundle, ds.samples,
        entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, k=10, num_rounds=2, num_reverse_rounds=2,
        group_size=4, dtype=jnp.float32,
    )
    assert stats.num_questions == len(ds.samples)
    assert stats.queries_per_s > 0

    apply = jax.jit(model.apply)
    by_id = {r.sample_id: r for r in results}
    for s in ds.samples:
        b = collate_retriever(
            [s], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
            question_emb=ds.question_emb, bucket=bucket,
        )
        logits = np.asarray(apply(params, b).logits)[: s.edge_index.shape[1]]
        k = min(10, logits.shape[0])
        want = np.argsort(-logits, kind="stable")[:k]
        got = by_id[s.sample_id]
        assert set(got.edge_ids[:k].tolist()) == set(want.tolist()), s.sample_id
        np.testing.assert_allclose(
            got.scores[:k], np.sort(logits)[::-1][:k], rtol=1e-4, atol=1e-5
        )

    rec = serve_recall_at_k(ds.samples, results, [1, 5, 10])
    assert set(rec) == {"serve/recall@1", "serve/recall@5", "serve/recall@10"}
    assert 0.0 <= rec["serve/recall@1"] <= rec["serve/recall@10"] <= 1.0

    # Data-parallel serving over the mesh returns identical rankings
    # (per-question scoring has no cross-question communication).
    if len(jax.devices()) >= 8:
        from evi_rag_tpu.parallel.mesh import make_mesh

        results_dp, stats_dp = serve_split(
            bundle, ds.samples,
            entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
            question_emb=ds.question_emb, k=10, num_rounds=2, num_reverse_rounds=2,
            group_size=8, dtype=jnp.float32, mesh=make_mesh(8),
        )
        assert stats_dp.num_questions == len(ds.samples)
        by_id_dp = {r.sample_id: r for r in results_dp}
        for r in results:
            got_dp = by_id_dp[r.sample_id]
            # The sharded program compiles to different fusions than the
            # single-device one; 1-ulp f32 differences can swap exact-tie
            # neighbors in the ranking.  Sets must match and scores must
            # agree to f32 fusion tolerance.
            assert set(got_dp.edge_ids.tolist()) == set(r.edge_ids.tolist()), r.sample_id
            ref_s = dict(zip(r.edge_ids.tolist(), r.scores.tolist()))
            for e, v in zip(got_dp.edge_ids.tolist(), got_dp.scores.tolist()):
                assert abs(ref_s[e] - v) < 1e-5 + 1e-5 * abs(ref_s[e]), (r.sample_id, e)


def test_serve_split_fused_routing_matches_xla():
    """Forcing the fused per-question kernel route (fused_threshold=1)
    returns the same rankings as the XLA path for every question."""
    from evi_rag_tpu.serving import serve_split

    ds = make_synthetic_dataset(num_samples=6, emb_dim=EMB, max_nodes=14, seed=19)
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    bucket = Bucket(graphs=2, nodes=64, edges=256)
    b0 = collate_retriever(
        ds.samples[:1], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    params = jax.jit(model.init)(jax.random.key(2), b0)
    bundle = export_retriever_features(params["params"], model.parity_meta())

    kw = dict(
        entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, k=10, num_rounds=2, num_reverse_rounds=2,
        group_size=3,
    )
    res_xla, _ = serve_split(bundle, ds.samples, dtype=jnp.bfloat16, **kw)
    res_fused, stats = serve_split(
        bundle, ds.samples, fused_threshold=1, fused_interpret=_ON_TPU is False,
        **kw,
    )
    by_id = {r.sample_id: r for r in res_fused}
    for r in res_xla:
        got = by_id[r.sample_id]
        # bf16 jitter can swap near-ties at the boundary; sets must overlap
        # on all but the tail and scores agree on the intersection.
        common = set(r.edge_ids.tolist()) & set(got.edge_ids.tolist())
        assert len(common) >= len(r.edge_ids) - 1, r.sample_id
        ref_s = dict(zip(r.edge_ids.tolist(), r.scores.tolist()))
        got_s = dict(zip(got.edge_ids.tolist(), got.scores.tolist()))
        for e in common:
            assert abs(ref_s[e] - got_s[e]) < 0.01 + 0.01 * abs(ref_s[e])


def test_serve_split_multi_bucket_drain_routing():
    """Wildly varied graph sizes force several (m_pad, n_pad) buckets in one
    window; the single-fetch drain must route each group's [G, k] slice back
    to the right questions (regression for the concat-offset bookkeeping)."""
    from evi_rag_tpu.serving import serve_split

    dss = [
        make_synthetic_dataset(num_samples=5, emb_dim=EMB, min_nodes=lo,
                               max_nodes=hi, seed=31 + lo)
        for lo, hi in ((8, 10), (24, 30), (60, 80))
    ]
    # One table set: re-point every sample at the first dataset's tables by
    # rebuilding with shared embeddings sized for the largest ids.
    base = dss[0]
    samples = []
    qid = 0
    import dataclasses as _dc

    for ds in dss:
        for s in ds.samples:
            samples.append(_dc.replace(s, question_id=qid, sample_id=f"s{qid}"))
            qid += 1
    n_q = len(samples)
    rng = np.random.default_rng(0)
    q_emb = rng.normal(size=(n_q, EMB)).astype(np.float32)
    ent = base.entity_emb
    rel = base.relation_emb

    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    bucket = Bucket(graphs=2, nodes=128, edges=512)
    b0 = collate_retriever(
        samples[:1], entity_emb=ent, relation_emb=rel, question_emb=q_emb,
        bucket=bucket,
    )
    params = jax.jit(model.init)(jax.random.key(5), b0)
    bundle = export_retriever_features(params["params"], model.parity_meta())

    kw = dict(entity_emb=ent, relation_emb=rel, question_emb=q_emb,
              k=8, num_rounds=2, num_reverse_rounds=2, dtype=jnp.float32)
    # group_size 2 over 15 samples of 3 very different size classes ->
    # multiple buckets, multiple groups per bucket, a trailing partial group.
    res_multi, _ = serve_split(bundle, samples, group_size=2, **kw)
    # group_size 1: every question alone (different bucket layout, same math).
    res_solo, _ = serve_split(bundle, samples, group_size=1, **kw)
    assert len(res_multi) == len(res_solo) == n_q
    solo = {r.sample_id: r for r in res_solo}
    for r in res_multi:
        want = solo[r.sample_id]
        np.testing.assert_array_equal(r.edge_ids, want.edge_ids)
        np.testing.assert_allclose(r.scores, want.scores, rtol=1e-5, atol=1e-6)


def test_serve_split_float32_never_routes_to_bf16_kernel():
    """An explicit float32 request must keep the XLA scorer even for buckets
    above fused_threshold: the fused Pallas kernel computes in bf16
    internally, so f32 + forced-threshold must be bit-identical to the plain
    f32 path (it would differ at ~1e-2 if the kernel were used)."""
    from evi_rag_tpu.serving import serve_split

    ds = make_synthetic_dataset(num_samples=6, emb_dim=EMB, max_nodes=14, seed=23)
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    bucket = Bucket(graphs=2, nodes=64, edges=256)
    b0 = collate_retriever(
        ds.samples[:1], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    params = jax.jit(model.init)(jax.random.key(3), b0)
    bundle = export_retriever_features(params["params"], model.parity_meta())

    kw = dict(
        entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, k=10, num_rounds=2, num_reverse_rounds=2,
        group_size=3, dtype=jnp.float32,
    )
    res_plain, _ = serve_split(bundle, ds.samples, **kw)
    res_forced, _ = serve_split(bundle, ds.samples, fused_threshold=1, **kw)
    by_id = {r.sample_id: r for r in res_forced}
    for r in res_plain:
        got = by_id[r.sample_id]
        np.testing.assert_array_equal(r.edge_ids, got.edge_ids)
        np.testing.assert_array_equal(r.scores, got.scores)


def test_serve_recall_counts_zero_positive_questions():
    """Zero-positive questions must count as recall 0 in the denominator
    (reference EdgeRecallAtK semantics, ``retriever_metrics.py:140-158``) so
    serve/recall@k stays comparable to eval_retriever's edge/recall@k."""
    from evi_rag_tpu.serving import ServeResult, serve_recall_at_k

    ds = make_synthetic_dataset(num_samples=2, emb_dim=8, max_nodes=10, seed=5)
    s_pos, s_zero = ds.samples
    s_zero.edge_labels[:] = 0.0  # unanswerable: no positive edges
    pos = np.nonzero(s_pos.edge_labels > 0.5)[0]
    results = [
        ServeResult(s_pos.sample_id, s_pos.question_id,
                    edge_ids=pos, scores=np.ones(pos.size, np.float32)),
        ServeResult(s_zero.sample_id, s_zero.question_id,
                    edge_ids=np.arange(3), scores=np.ones(3, np.float32)),
    ]
    rec = serve_recall_at_k(ds.samples, results, [100])
    assert rec["serve/recall@100"] == 0.5  # perfect + zero-positive -> mean 0.5
    rec_rp = serve_recall_at_k(ds.samples, results, [100], require_positive=True)
    assert rec_rp["serve/recall@100"] == 1.0

    # Edgeless questions skip the denominator entirely (reference
    # retriever_metrics.py:125-131; matches edge_recall_at_k's edge_count>0).
    import dataclasses as _dc

    s_empty = _dc.replace(
        s_zero,
        sample_id="empty",
        edge_index=np.zeros((2, 0), np.int64),
        edge_relations=np.zeros(0, np.int64),
        edge_labels=np.zeros(0, np.float32),
    )
    results_e = results + [ServeResult("empty", s_empty.question_id,
                                       edge_ids=np.zeros(0, np.int64),
                                       scores=np.zeros(0, np.float32))]
    rec_e = serve_recall_at_k(list(ds.samples) + [s_empty], results_e, [100])
    assert rec_e["serve/recall@100"] == 0.5  # edgeless sample excluded


def test_serve_task_reprojects_per_split(tmp_path):
    """Synthetic splits regenerate their embedding tables per split, so the
    serve task must re-project rather than reuse the first split's tables
    (regression: reuse produced silently wrong rankings)."""
    from evi_rag_tpu import cli
    from evi_rag_tpu.train.checkpoint import save_checkpoint

    ds0 = make_synthetic_dataset(num_samples=4, emb_dim=EMB, max_nodes=10, seed=0)
    bucket = Bucket(graphs=2, nodes=32, edges=128)
    b0 = collate_retriever(
        ds0.samples[:1], entity_emb=ds0.entity_emb, relation_emb=ds0.relation_emb,
        question_emb=ds0.question_emb, bucket=bucket,
    )
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    params = jax.jit(model.init)(jax.random.key(0), b0)
    save_checkpoint(tmp_path / "ckpt", params, meta={"parity_meta": model.parity_meta()})

    def run(splits):
        cfg = {
            "dataset": {"source": "synthetic", "num_samples": 4, "emb_dim": EMB, "max_nodes": 10},
            "retriever": {"ckpt": str(tmp_path / "ckpt"),
                          "model": {"emb_dim": EMB, "hidden_dim": EMB, "dropout_p": 0.0}},
            "serve": {"splits": splits, "k": 10, "k_values": [5],
                      "write_jsonl": False, "compute_dtype": "float32"},
        }
        d = tmp_path / ("run_" + "_".join(splits))
        d.mkdir(exist_ok=True)
        return cli.task_serve.__wrapped__(cfg, run_dir=d)

    multi = run(["validation", "test"])
    solo = run(["test"])
    assert multi["test/serve/recall@5"] == solo["test/serve/recall@5"]


def test_serve_split_dp_odd_group_size_and_counts():
    """DP windowed serving handles a group_size that is NOT a multiple of the
    device count (rounded up) and a sample count that leaves a partial
    trailing group (padded with empty questions): every question returns and
    matches the single-device result set (unified window path, round 4)."""
    from evi_rag_tpu.parallel.mesh import make_mesh
    from evi_rag_tpu.serving import serve_split

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    ds = make_synthetic_dataset(num_samples=11, emb_dim=EMB, max_nodes=14, seed=23)
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    bucket = Bucket(graphs=2, nodes=64, edges=256)
    b0 = collate_retriever(
        ds.samples[:1], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    params = jax.jit(model.init)(jax.random.key(5), b0)
    bundle = export_retriever_features(params["params"], model.parity_meta())
    kw = dict(entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
              question_emb=ds.question_emb, k=8, num_rounds=2,
              num_reverse_rounds=2, dtype=jnp.float32)
    res_1d, _ = serve_split(bundle, ds.samples, group_size=5, **kw)
    res_dp, stats = serve_split(
        bundle, ds.samples, group_size=5, mesh=make_mesh(8), **kw
    )
    assert stats.num_questions == len(ds.samples) == len(res_dp)
    by_id = {r.sample_id: r for r in res_dp}
    for r in res_1d:
        got = by_id[r.sample_id]
        assert set(got.edge_ids.tolist()) == set(r.edge_ids.tolist()), r.sample_id


def test_serve_split_dispatch_ladder_parity(monkeypatch):
    """The B-window dispatch ladder (full B_LARGE chunks + B_SMALL remainder,
    each padded to its capacity) returns results identical to the flat
    B_SMALL-only plan, including with the warmup pre-compile pass that
    compiles exactly the (bucket, width) pairs the plan uses."""
    from evi_rag_tpu.serving import serve_split

    ds = make_synthetic_dataset(num_samples=11, emb_dim=EMB, max_nodes=14, seed=13)
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    bucket = Bucket(graphs=2, nodes=64, edges=256)
    batch0 = collate_retriever(
        ds.samples[:1], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    params = jax.jit(model.init)(jax.random.key(3), batch0)
    bundle = export_retriever_features(params["params"], model.parity_meta())
    kw = dict(
        entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, k=10, num_rounds=2, num_reverse_rounds=2,
        group_size=1, dtype=jnp.float32, warmup=True,
    )

    monkeypatch.setenv("EVI_SERVE_B_WINDOW", "2")
    monkeypatch.setenv("EVI_SERVE_B_WINDOW_MAX", "4")
    ladder, stats_l = serve_split(bundle, ds.samples, **kw)

    monkeypatch.setenv("EVI_SERVE_B_WINDOW_MAX", "2")
    flat, _ = serve_split(bundle, ds.samples, **kw)

    assert stats_l.num_questions == len(ds.samples)
    by_id = {r.sample_id: r for r in flat}
    for r in ladder:
        np.testing.assert_array_equal(r.edge_ids, by_id[r.sample_id].edge_ids)
        np.testing.assert_array_equal(r.scores, by_id[r.sample_id].scores)
