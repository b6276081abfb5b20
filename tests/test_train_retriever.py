"""End-to-end retriever training on synthetic data: loss falls, recall rises."""

import jax
import numpy as np
import pytest

from evi_rag_tpu.data.feeder import Bucket, collate_retriever, iter_stacked_batches
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.models.losses import RetrieverLossConfig
from evi_rag_tpu.models.retriever import Retriever
from evi_rag_tpu.train.optim import OptimizerConfig, ParamGroup, setup_optimizer
from evi_rag_tpu.train.retriever_trainer import (
    RetrieverTrainConfig,
    create_train_state,
    evaluate,
    fit,
    make_eval_step,
    make_train_step,
)

EMB = 32


@pytest.fixture(scope="module")
def data():
    train = make_synthetic_dataset(num_samples=48, emb_dim=EMB, max_nodes=16, seed=2)
    return train


def test_train_improves_recall(data):
    ds = data
    model = Retriever(emb_dim=EMB, hidden_dim=64, dropout_p=0.0)
    cfg = RetrieverTrainConfig(
        loss=RetrieverLossConfig(infonce_temperature=1.0),
        optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3, grad_clip_norm=1.0),
        max_epochs=8,
        k_values=(1, 5, 10),
        monitor="edge/recall@5",
        patience=8,
    )
    bucket = Bucket(graphs=9, nodes=256, edges=1024)
    kwargs = dict(
        entity_emb=ds.entity_emb,
        relation_emb=ds.relation_emb,
        question_emb=ds.question_emb,
    )

    def train_batches(epoch):
        return iter_stacked_batches(
            ds.samples, num_shards=2, per_shard_batch=8, bucket=bucket, seed=epoch, **kwargs
        )

    def val_batches():
        for i in range(0, 16, 8):
            yield collate_retriever(ds.samples[i : i + 8], bucket=bucket, **kwargs)

    # Baseline metrics with random init.
    first = next(iter(train_batches(0)))
    state, tx = create_train_state(model, first, cfg, seed=0)
    eval_step = make_eval_step(model, cfg)
    before = evaluate(state.params, eval_step, val_batches())

    best_params, info = fit(model, cfg, train_batches, val_batches, seed=0)
    after = evaluate(best_params, eval_step, val_batches())

    assert info["history"], "no epochs ran"
    assert after["edge/recall@5"] > before["edge/recall@5"] + 0.05, (
        f"recall@5 did not improve: {before['edge/recall@5']:.3f} -> {after['edge/recall@5']:.3f}"
    )
    assert after["edge/recall@5"] > 0.5
    # Reachability@k and separation should be sane.
    assert 0.0 <= after["answer/reachability@10"] <= 1.0
    assert after["bridge/pos_edge_frac"] <= 1.0


def test_muon_param_groups_step(data):
    """Muon on 2D matrices + AdamW elsewhere performs a finite update."""
    ds = data
    model = Retriever(emb_dim=EMB, hidden_dim=64, dropout_p=0.0)
    cfg = RetrieverTrainConfig(
        optimizer=OptimizerConfig(
            name="adamw",
            learning_rate=1e-3,
            schedule="cosine",
            total_steps=100,
            warmup_steps=0,
            groups=(
                ParamGroup(patterns=("params/state_net_*/kernel", "params/score_head/kernel"), optimizer="muon"),
            ),
        ),
        max_epochs=1,
        k_values=(5,),
    )
    bucket = Bucket(graphs=5, nodes=128, edges=512)
    batch = collate_retriever(
        ds.samples[:4],
        entity_emb=ds.entity_emb,
        relation_emb=ds.relation_emb,
        question_emb=ds.question_emb,
        bucket=bucket,
    )
    stacked = jax.tree.map(lambda x: x[None], batch)
    state, tx = create_train_state(model, batch, cfg, seed=0)
    step = make_train_step(model, tx, cfg)
    state2, metrics = step(state, stacked)
    assert np.isfinite(float(metrics["loss"]))
    # Params actually moved.
    diff = sum(
        float(abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params))
    )
    assert diff > 0


@pytest.mark.parametrize("shape", [(16, 16), (32, 8), (8, 32)])
def test_newton_schulz_approximates_polar_factor(shape):
    """The quintic NS iteration lands near the orthogonal polar factor UV^T
    (the Muon semantics; reference uses the muon-optimizer package,
    ``src/utils/optimization.py:173-218``).  bf16 + 5 steps gives singular
    values in a band around 1 and high alignment with the exact factor."""
    from evi_rag_tpu.train.optim import newton_schulz_orthogonalize

    rng = np.random.default_rng(int(np.prod(shape)))
    g = rng.normal(size=shape).astype(np.float32)
    x = np.asarray(newton_schulz_orthogonalize(jax.numpy.asarray(g)), dtype=np.float64)
    s = np.linalg.svd(x, compute_uv=False)
    assert 0.4 < s.min() and s.max() < 1.4, s
    u, _, vt = np.linalg.svd(g, full_matrices=False)
    polar = u @ vt
    cos = float((x * polar).sum() / (np.linalg.norm(x) * np.linalg.norm(polar)))
    assert cos > 0.97, cos


def test_bce_loss_path(data):
    import jax.numpy as jnp

    from evi_rag_tpu.data.feeder import Bucket, collate_retriever
    from evi_rag_tpu.models.losses import RetrieverLossConfig, retriever_loss

    ds = data
    bucket = Bucket(graphs=5, nodes=128, edges=512)
    batch = collate_retriever(
        ds.samples[:4], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    cfg = RetrieverLossConfig(infonce_weight=1.0, bce_weight=0.5)
    out = retriever_loss(
        jnp.zeros(batch.graph.num_edges), batch.edge_labels, batch.graph.edge_batch,
        num_graphs=batch.graph.num_graphs, graph_mask=batch.graph.graph_mask,
        edge_mask=batch.graph.edge_mask, config=cfg,
    )
    # zeros logits: per-edge BCE = log(2) for every edge in every graph.
    np.testing.assert_allclose(float(out.components["bce"]), np.log(2.0), rtol=1e-5)
    assert float(out.loss) == pytest.approx(
        float(out.components["infonce"]) + 0.5 * np.log(2.0), rel=1e-5
    )


def test_remat_matches_plain(data):
    """jax.checkpoint in the train step changes memory, not math."""
    import dataclasses as dc

    from evi_rag_tpu.data.feeder import Bucket, collate_stacked

    ds = data
    model = Retriever(emb_dim=EMB, hidden_dim=64, dropout_p=0.0)
    bucket = Bucket(graphs=5, nodes=128, edges=512)
    stacked = collate_stacked(
        ds.samples[:8], num_shards=2, entity_emb=ds.entity_emb,
        relation_emb=ds.relation_emb, question_emb=ds.question_emb, bucket=bucket,
    )
    base = RetrieverTrainConfig(
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-3), k_values=(5,)
    )
    outs = []
    for remat in (False, True):
        cfg = dc.replace(base, remat=remat)
        state, tx = create_train_state(model, stacked, cfg, seed=0)
        step = make_train_step(model, tx, cfg)
        state, m = step(state, stacked)
        outs.append((float(m["loss"]), float(m["grad_norm"])))
    # Identical loss; gradients agree up to compiler reassociation (adamw's
    # normalized update would amplify near-zero-grad sign flips, so compare
    # the pre-update quantities).
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-6)
    assert outs[0][1] == pytest.approx(outs[1][1], rel=1e-3)


def test_seed_reproducibility(data):
    """Identical seeds give bit-identical training trajectories."""
    ds = data
    model = Retriever(emb_dim=EMB, hidden_dim=64, dropout_p=0.1)
    from evi_rag_tpu.data.feeder import Bucket, collate_stacked

    bucket = Bucket(graphs=5, nodes=128, edges=512)
    stacked = collate_stacked(
        ds.samples[:8], num_shards=2, entity_emb=ds.entity_emb,
        relation_emb=ds.relation_emb, question_emb=ds.question_emb, bucket=bucket,
    )
    cfg = RetrieverTrainConfig(
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-3), k_values=(5,)
    )

    def run():
        state, tx = create_train_state(model, stacked, cfg, seed=7)
        step = make_train_step(model, tx, cfg)
        for _ in range(2):
            state, m = step(state, stacked)
        return float(m["loss"]), state.params

    l1, p1 = run()
    l2, p2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
