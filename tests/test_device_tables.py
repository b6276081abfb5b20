"""Device-resident embedding tables (id-feed batches) == dense host gathers.

The training-path twin of the serve surface's resident projected tables:
``collate_*(id_feed=True)`` ships int32 table rows; the jitted step gathers
from an ``EmbedTables`` upload (one per task).  Materialized batches must be
BITWISE equal to the dense collation (the tables carry a zero pad row at
index V so padding rows match the host path's zeros), hence train/eval steps
must produce identical numbers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from evi_rag_tpu.data.feeder import (
    collate_agent,
    collate_retriever,
    collate_stacked,
    fixed_agent_bucket,
    fixed_bucket_for,
)
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.models.batches import (
    make_tables,
    materialize_agent_batch,
    materialize_retriever_batch,
)

EMB = 32


def _ds():
    return make_synthetic_dataset(num_samples=8, emb_dim=EMB, max_nodes=16, seed=3)


def _tree_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_retriever_feed_materializes_bitwise_equal():
    ds = _ds()
    bucket = fixed_bucket_for(ds.samples, 4)
    kw = dict(entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
              question_emb=ds.question_emb, bucket=bucket)
    tables = make_tables(ds.entity_emb, ds.relation_emb)
    dense = collate_retriever(ds.samples[:4], **kw)
    feed = collate_retriever(ds.samples[:4], id_feed=True, **kw)
    assert feed.node_emb is None and feed.edge_emb is None
    got = jax.jit(lambda b: materialize_retriever_batch(b, tables))(feed)
    assert got.node_rows is None and got.edge_rows is None
    _tree_equal(dense, got)


def test_retriever_feed_stacked_materializes_bitwise_equal():
    ds = _ds()
    bucket = fixed_bucket_for(ds.samples, 4)
    kw = dict(entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
              question_emb=ds.question_emb, bucket=bucket, num_shards=2)
    tables = make_tables(ds.entity_emb, ds.relation_emb)
    dense = collate_stacked(ds.samples, **kw)
    feed = collate_stacked(ds.samples, id_feed=True, **kw)
    got = jax.jit(lambda b: materialize_retriever_batch(b, tables))(feed)
    _tree_equal(dense, got)


def _agents(ds):
    from evi_rag_tpu.data.g_agent import AgentSettings, build_agent_sample

    rng = np.random.default_rng(0)
    out = []
    for s in ds.samples:
        a = build_agent_sample(
            sample_id=s.sample_id, question_id=s.question_id,
            heads=s.edge_index[0], tails=s.edge_index[1],
            relations=s.edge_relations,
            labels=s.edge_labels.astype(np.float32),
            scores=rng.normal(size=s.edge_index.shape[1]).astype(np.float32),
            node_entity_ids=np.arange(100, 100 + s.num_nodes),
            node_embedding_ids=s.node_embedding_ids,
            start_entity_ids=100 + s.topic_locals,
            answer_entity_ids=100 + s.answer_locals,
            settings=AgentSettings(edge_top_k=50, score_mode="logits"),
        )
        if a is not None:
            out.append(a)
    return out


def test_agent_feed_materializes_bitwise_equal():
    ds = _ds()
    agents = _agents(ds)[:4]
    bucket = fixed_agent_bucket(agents, 4)
    kw = dict(entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
              question_emb=ds.question_emb, bucket=bucket)
    tables = make_tables(ds.entity_emb, ds.relation_emb)
    dense = collate_agent(agents, **kw)
    feed = collate_agent(agents, id_feed=True, **kw)
    assert feed.node_emb is None and feed.edge_emb is None
    got = jax.jit(lambda b: materialize_agent_batch(b, tables))(feed)
    _tree_equal(dense, got)


def test_retriever_train_step_identical_with_feed():
    """One jitted update from the same state: dense batch vs id-feed batch
    + tables give bitwise-identical loss and updated params."""
    from evi_rag_tpu.models.retriever import Retriever
    from evi_rag_tpu.train.retriever_trainer import (
        RetrieverTrainConfig,
        create_train_state,
        make_train_step,
    )

    ds = _ds()
    bucket = fixed_bucket_for(ds.samples, 4)
    kw = dict(entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
              question_emb=ds.question_emb, bucket=bucket, num_shards=1)
    dense = collate_stacked(ds.samples[:4], **kw)
    feed = collate_stacked(ds.samples[:4], id_feed=True, **kw)
    tables = make_tables(ds.entity_emb, ds.relation_emb)

    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    cfg = RetrieverTrainConfig(k_values=(1, 5))
    outs = {}
    for name, batch, tb in (("dense", dense, None), ("feed", feed, tables)):
        state, tx = create_train_state(model, batch, cfg, seed=0, tables=tb)
        step = make_train_step(model, tx, cfg, tables=tb)
        new_state, metrics = step(state, batch)
        outs[name] = (float(metrics["loss"]),
                      [np.asarray(x) for x in jax.tree.leaves(new_state.params)])
    assert outs["dense"][0] == outs["feed"][0]
    for a, b in zip(outs["dense"][1], outs["feed"][1]):
        np.testing.assert_array_equal(a, b)


def test_gfn_train_step_identical_with_feed():
    from evi_rag_tpu.models.batches import RetrieverBatch
    from evi_rag_tpu.models.retriever import Retriever
    from evi_rag_tpu.train.checkpoint import export_retriever_features
    from evi_rag_tpu.train.gflownet_trainer import (
        GFlowNetConfig,
        build_modules,
        init_gflownet_params,
        make_gfn_train_step,
    )
    from evi_rag_tpu.train.optim import OptimizerConfig, setup_optimizer
    from evi_rag_tpu.train.retriever_trainer import TrainState

    ds = _ds()
    agents = _agents(ds)[:4]
    bucket = fixed_agent_bucket(agents, 4)
    kw = dict(entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
              question_emb=ds.question_emb, bucket=bucket)
    dense = collate_agent(agents, **kw)
    feed = collate_agent(agents, id_feed=True, **kw)
    tables = make_tables(ds.entity_emb, ds.relation_emb)

    retr = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    rb = RetrieverBatch(
        graph=dense.graph, node_emb=dense.node_emb,
        node_is_nontext=dense.node_is_nontext, edge_emb=dense.edge_emb,
        question_emb=dense.question_emb,
        topic_one_hot=jnp.stack(
            [dense.node_is_start.astype(jnp.float32),
             1 - dense.node_is_start.astype(jnp.float32)], -1),
        edge_labels=dense.edge_labels, node_is_q=dense.node_is_start,
        node_is_a=dense.node_is_answer,
    )
    rp = jax.jit(retr.init)(jax.random.key(0), rb)
    bundle = export_retriever_features(rp["params"], retr.parity_meta())
    cfg = GFlowNetConfig(
        hidden_dim=EMB, max_steps=2, num_train_rollouts=2, dropout=0.0,
        bc_weight=0.5, total_steps=10,
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-3),
    )
    mods = build_modules(cfg)
    outs = {}
    for name, batch, tb in (("dense", dense, None), ("feed", feed, tables)):
        params = init_gflownet_params(cfg, mods, bundle, batch, seed=0, tables=tb)
        tx = setup_optimizer(cfg.optimizer, params)
        state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                           step=jnp.zeros((), jnp.int32), rng=jax.random.key(1))
        step = make_gfn_train_step(mods, tx, cfg, bundle, tables=tb)
        _, metrics = step(state, batch)
        outs[name] = float(metrics["loss"])
    assert outs["dense"] == outs["feed"]


def test_feed_without_tables_raises():
    ds = _ds()
    bucket = fixed_bucket_for(ds.samples, 4)
    feed = collate_retriever(
        ds.samples[:4], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket, id_feed=True,
    )
    try:
        materialize_retriever_batch(feed, None)
    except ValueError as e:
        assert "EmbedTables" in str(e)
    else:
        raise AssertionError("expected ValueError")
