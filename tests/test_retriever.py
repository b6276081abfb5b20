"""Retriever forward: shapes, padding invariance, loss vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.data.feeder import Bucket, collate_retriever
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.models.losses import RetrieverLossConfig, retriever_loss
from evi_rag_tpu.models.retriever import Retriever

EMB = 32


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(num_samples=6, emb_dim=EMB, max_nodes=20, seed=1)


def _model():
    return Retriever(emb_dim=EMB, hidden_dim=48, dde_rounds=2, dde_reverse_rounds=2, dropout_p=0.0)


def _batch(ds, idx, bucket=None):
    samples = [ds.samples[i] for i in idx]
    if bucket is None:
        bucket = Bucket.for_batch(
            len(samples),
            sum(s.num_nodes for s in samples),
            sum(s.edge_index.shape[1] for s in samples),
            node_base=32,
            edge_base=64,
        )
    return collate_retriever(
        samples,
        entity_emb=ds.entity_emb,
        relation_emb=ds.relation_emb,
        question_emb=ds.question_emb,
        bucket=bucket,
    )


def test_forward_shapes(ds):
    batch = _batch(ds, [0, 1, 2])
    model = _model()
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    E = batch.graph.num_edges
    assert out.logits.shape == (E,)
    assert out.edge_embeddings.shape == (E, 48)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_padding_invariance(ds):
    """Same graphs in two different bucket sizes => identical real-edge logits."""
    small = Bucket(graphs=4, nodes=96, edges=512)
    big = Bucket(graphs=8, nodes=256, edges=1024)
    b1 = _batch(ds, [0, 1, 2], bucket=small)
    b2 = _batch(ds, [0, 1, 2], bucket=big)
    model = _model()
    params = jax.jit(model.init)(jax.random.key(0), b1)
    l1 = np.asarray(jax.jit(model.apply)(params, b1).logits)
    l2 = np.asarray(jax.jit(model.apply)(params, b2).logits)
    ne = int(np.asarray(b1.graph.edge_mask).sum())
    assert int(np.asarray(b2.graph.edge_mask).sum()) == ne
    np.testing.assert_allclose(l1[:ne], l2[:ne], rtol=1e-4, atol=1e-5)


def test_direction_modes(ds):
    batch = _batch(ds, [0, 1])
    for mode in ("forward", "backward", "bidirectional"):
        model = Retriever(emb_dim=EMB, hidden_dim=48, direction_mode=mode, dropout_p=0.0)
        params = jax.jit(model.init)(jax.random.key(0), batch)
        out = jax.jit(model.apply)(params, batch)
        assert np.isfinite(np.asarray(out.logits)).all()
    # Bidirectional combine is a softmax-weighted mean of the two views:
    # it must lie between them elementwise.
    model = _model()
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    lo = np.minimum(np.asarray(out.logits_fwd), np.asarray(out.logits_bwd))
    hi = np.maximum(np.asarray(out.logits_fwd), np.asarray(out.logits_bwd))
    l = np.asarray(out.logits)
    assert (l >= lo - 1e-5).all() and (l <= hi + 1e-5).all()


def test_hide_seek_bias_train_only(ds):
    batch = _batch(ds, [0, 1])
    model = Retriever(
        emb_dim=EMB,
        hidden_dim=48,
        dropout_p=0.0,
        hide_seek_enabled=True,
        hide_seek_p_near=1.0,
        hide_seek_p_far=0.0,
        hide_seek_bias_near=-5.0,
        hide_seek_bias_far=0.0,
    )
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out_eval = jax.jit(model.apply)(params, batch)  # eval: no bias
    out_train = jax.jit(lambda p, b, r1, r2: model.apply(p, b, train=True, rngs={'hide_seek': r1, 'dropout': r2}))(
        params, batch, jax.random.key(1), jax.random.key(2)
    )
    near = np.asarray(batch.edge_is_near) & np.asarray(batch.graph.edge_mask)
    diff = np.asarray(out_train.logits) - np.asarray(out_eval.logits)
    # p_near=1 => every near edge demoted in both directional views; combined
    # logit shifts by exactly the bias (softmax weights invariant to shift).
    np.testing.assert_allclose(diff[near], -5.0, atol=1e-4)
    far = ~np.asarray(batch.edge_is_near) & np.asarray(batch.graph.edge_mask)
    np.testing.assert_allclose(diff[far], 0.0, atol=1e-4)


def test_infonce_vs_dense_reference(ds):
    batch = _batch(ds, [0, 1, 2])
    rng = np.random.default_rng(3)
    E = batch.graph.num_edges
    logits = rng.normal(size=E).astype(np.float32)
    labels = np.asarray(batch.edge_labels)
    eb = np.asarray(batch.graph.edge_batch)
    emask = np.asarray(batch.graph.edge_mask)
    gmask = np.asarray(batch.graph.graph_mask)
    cfg = RetrieverLossConfig(infonce_temperature=0.7)
    out = retriever_loss(
        jnp.asarray(logits),
        jnp.asarray(labels),
        jnp.asarray(eb),
        num_graphs=batch.graph.num_graphs,
        graph_mask=jnp.asarray(gmask),
        edge_mask=jnp.asarray(emask),
        config=cfg,
    )
    # Dense per-graph reference.
    losses = []
    for g in range(batch.graph.num_graphs):
        if not gmask[g]:
            continue
        sel = (eb == g) & emask
        s = logits[sel] / 0.7
        y = labels[sel] > 0.5
        if y.sum() == 0 or (~y).sum() == 0:
            continue
        lse_all = np.log(np.exp(s - s.max()).sum()) + s.max()
        sp = s[y]
        lse_pos = np.log(np.exp(sp - sp.max()).sum()) + sp.max()
        losses.append(lse_all - lse_pos)
    want = np.mean(losses)
    np.testing.assert_allclose(float(out.loss), want, rtol=1e-5)
    assert float(out.metrics["infonce_graphs"]) == len(losses)


def test_infonce_edge_weights(ds):
    batch = _batch(ds, [0, 1])
    cfg = RetrieverLossConfig(edge_weight_near=2.0, edge_weight_bridge=0.5)
    assert cfg.requires_edge_is_near
    out = retriever_loss(
        jnp.zeros(batch.graph.num_edges),
        batch.edge_labels,
        batch.graph.edge_batch,
        num_graphs=batch.graph.num_graphs,
        graph_mask=batch.graph.graph_mask,
        edge_mask=batch.graph.edge_mask,
        config=cfg,
        edge_is_near=batch.edge_is_near,
    )
    assert np.isfinite(float(out.loss))
    with pytest.raises(ValueError, match="edge_is_near"):
        retriever_loss(
            jnp.zeros(batch.graph.num_edges),
            batch.edge_labels,
            batch.graph.edge_batch,
            num_graphs=batch.graph.num_graphs,
            graph_mask=batch.graph.graph_mask,
            edge_mask=batch.graph.edge_mask,
            config=cfg,
        )


def test_loss_grad_flows(ds):
    batch = _batch(ds, [0, 1, 2])
    model = _model()
    params = jax.jit(model.init)(jax.random.key(0), batch)
    cfg = RetrieverLossConfig()

    def loss_fn(p):
        out = model.apply(p, batch)
        return retriever_loss(
            out.logits,
            batch.edge_labels,
            batch.graph.edge_batch,
            num_graphs=batch.graph.num_graphs,
            graph_mask=batch.graph.graph_mask,
            edge_mask=batch.graph.edge_mask,
            config=cfg,
        ).loss

    g = jax.jit(jax.grad(loss_fn))(params)
    norms = jax.tree.map(lambda x: float(jnp.abs(x).sum()), g)
    total = sum(jax.tree.leaves(norms))
    assert np.isfinite(total) and total > 0


def test_bf16_compute_close_to_f32(ds):
    batch = _batch(ds, [0, 1, 2])
    f32 = Retriever(emb_dim=EMB, hidden_dim=48, dropout_p=0.0)
    bf16 = Retriever(emb_dim=EMB, hidden_dim=48, dropout_p=0.0, compute_dtype="bfloat16")
    params = jax.jit(f32.init)(jax.random.key(0), batch)
    lo32 = np.asarray(jax.jit(f32.apply)(params, batch).logits)
    lo16 = np.asarray(jax.jit(bf16.apply)(params, batch).logits)
    assert lo16.dtype == np.float32  # logits always f32
    emask = np.asarray(batch.graph.edge_mask)
    scale = np.abs(lo32[emask]).mean()
    assert np.abs(lo32[emask] - lo16[emask]).max() < 0.2 * scale + 0.05
    assert np.corrcoef(lo32[emask], lo16[emask])[0, 1] > 0.995
