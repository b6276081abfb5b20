"""Checkpoint roundtrip + the retriever->GFlowNet parity handshake."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.data.feeder import Bucket, collate_retriever
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.models.retriever import Retriever
from evi_rag_tpu.train.checkpoint import (
    export_retriever_features,
    load_checkpoint,
    params_digest,
    save_checkpoint,
    validate_parity_meta,
)

EMB = 16


@pytest.fixture(scope="module")
def trained():
    ds = make_synthetic_dataset(num_samples=4, emb_dim=EMB, max_nodes=10, seed=3)
    batch = collate_retriever(
        ds.samples[:2], entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=Bucket(graphs=3, nodes=64, edges=256),
    )
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    return model, params, batch


def test_save_load_roundtrip(tmp_path, trained):
    model, params, _ = trained
    digest = save_checkpoint(
        tmp_path / "ck", params, meta={"parity_meta": model.parity_meta()}, step=7
    )
    tree, meta = load_checkpoint(tmp_path / "ck")
    assert meta["params_sha256"] == digest
    assert meta["step"] == 7
    assert meta["parity_meta"]["num_topics"] == 2
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(tree["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_digest_detects_corruption(tmp_path, trained):
    model, params, _ = trained
    save_checkpoint(tmp_path / "ck", params, meta={})
    tree, _ = load_checkpoint(tmp_path / "ck")
    # Tamper with a leaf and verify the digest changes.
    tampered = jax.tree.map(lambda x: x, tree["params"])
    d1 = params_digest(tree["params"])
    tampered["params"]["q_gate"]["bias"] = tampered["params"]["q_gate"]["bias"] + 1
    assert params_digest(tampered) != d1


def test_export_features_and_parity(trained):
    model, params, batch = trained
    bundle = export_retriever_features(params["params"], model.parity_meta())
    assert set(bundle["features"]) >= {"entity_proj", "q_gate", "state_net_0", "score_head"}
    validate_parity_meta(bundle["parity_meta"], model.parity_meta())
    with pytest.raises(ValueError, match="parity_meta mismatch"):
        validate_parity_meta(bundle["parity_meta"], {**model.parity_meta(), "dde_rounds": 4})
    with pytest.raises(KeyError, match="missing feature keys"):
        export_retriever_features({"entity_proj": {}}, model.parity_meta())


def test_embedder_matches_retriever_features(trained):
    """The exported bundle reproduces the retriever's edge geometry exactly:
    the GFlowNet embedder's fwd geometry features == the retriever's
    internal forward-view features (parity handshake end-to-end)."""
    from evi_rag_tpu.models.gflownet.embedder import (
        _geometry_features,
        _projector,
    )
    from evi_rag_tpu.models.dde import build_node_struct_features

    model, params, batch = trained
    bundle = export_retriever_features(params["params"], model.parity_meta())
    feats = bundle["features"]
    gb = batch.graph

    # Reference computation via the retriever itself.
    out = jax.jit(model.apply)(params, batch)

    # Recompute the forward logits from the exported bundle.
    q = _projector(feats["query_proj"], batch.question_emb)[gb.edge_batch]
    node = _projector(feats["entity_proj"], batch.node_emb)
    non_text = _projector(feats["entity_proj"], feats["non_text_entity_emb"][None, :])[0]
    node = jnp.where(batch.node_is_nontext[:, None], non_text[None, :], node)
    rel = _projector(feats["relation_proj"], batch.edge_emb)
    struct = build_node_struct_features(
        batch.topic_one_hot, gb.edge_index, num_rounds=2, num_reverse_rounds=2,
        edge_mask=gb.edge_mask,
    )
    struct_fwd = jnp.concatenate([struct[gb.heads], struct[gb.tails]], axis=-1)
    feats_fwd = _geometry_features(
        feats, q_edge=q, head_edge=node[gb.heads], relation_edge=rel,
        tail_edge=node[gb.tails], struct_edge=struct_fwd,
    )
    logits_fwd = feats_fwd @ feats["score_head"]["kernel"][:, 0] + feats["score_head"]["bias"][0]
    np.testing.assert_allclose(
        np.asarray(logits_fwd), np.asarray(out.logits_fwd), rtol=2e-4, atol=2e-5
    )


def test_fit_resume_roundtrip(tmp_path, trained):
    """fit(resume_from=...) restores params + opt_state and continues."""
    import jax.numpy as jnp

    from evi_rag_tpu.data.feeder import Bucket, collate_retriever
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset
    from evi_rag_tpu.train.retriever_trainer import (
        RetrieverTrainConfig,
        create_train_state,
        fit,
    )
    from evi_rag_tpu.train.optim import OptimizerConfig

    model, params, batch = trained
    cfg = RetrieverTrainConfig(
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-3),
        max_epochs=1, k_values=(5,), monitor="edge/recall@5",
    )
    ds = make_synthetic_dataset(num_samples=4, emb_dim=EMB, max_nodes=10, seed=3)
    bucket = Bucket(graphs=3, nodes=64, edges=256)
    kw = dict(entity_emb=ds.entity_emb, relation_emb=ds.relation_emb, question_emb=ds.question_emb)

    def train_batches(epoch):
        b = collate_retriever(ds.samples[:2], bucket=bucket, **kw)
        yield jax.tree.map(lambda x: x[None], b)

    def val_batches():
        yield collate_retriever(ds.samples[2:4], bucket=bucket, **kw)

    state, tx = create_train_state(model, collate_retriever(ds.samples[:2], bucket=bucket, **kw), cfg)
    save_checkpoint(tmp_path / "resume", state.params, meta={}, opt_state=state.opt_state, step=5)
    best, info = fit(model, cfg, train_batches, val_batches, resume_from=str(tmp_path / "resume"))
    assert int(info["final_state"].step) == 6  # resumed at 5, ran 1 step
