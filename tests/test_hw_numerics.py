"""Hardware bf16 numerics lane (VERDICT round-1 weak #6).

Runs in the normal CPU suite too, but its purpose is ``make test-tpu``
(``EVI_TESTS_ON_TPU=1``): on the real chip bf16 matmuls hit the MXU with
hardware rounding, which the CPU emulation does not exercise.  Asserts the
retriever's bf16 compute path and the fused Pallas kernel stay within
documented tolerance of the f32 reference on-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bench import build_inputs, make_bundle
from evi_rag_tpu.ops.query import TripleIndex, query_topk, score_all

ON_TPU = jax.default_backend() not in ("cpu",)
INTERPRET = jax.default_backend() == "cpu"

D, H, S, M, B = 128, 128, 20, 2048, 4


@pytest.fixture(scope="module")
def setup():
    bundle = jax.tree.map(jnp.asarray, make_bundle(D, H, S, seed=3))
    ins = build_inputs(M, D, S, batch=B, seed=3)
    index = TripleIndex(
        head_repr=jnp.asarray(ins["head"]), rel_repr=jnp.asarray(ins["rel"]),
        tail_repr=jnp.asarray(ins["tail"]), struct_raw=jnp.asarray(ins["struct"]),
    )
    return bundle, index, jnp.asarray(ins["q"])


def test_bf16_scores_track_f32(setup):
    bundle, index, q = setup
    f32 = np.asarray(score_all(bundle, q, index, dtype=jnp.float32))
    b16 = np.asarray(score_all(bundle, q, index, dtype=jnp.bfloat16))
    scale = np.abs(f32).mean()
    err = np.abs(f32 - b16)
    # bf16 rounding noise must stay a small fraction of the score scale.
    assert np.quantile(err, 0.999) < 0.08 * scale + 0.03
    for b in range(B):
        assert np.corrcoef(f32[b], b16[b])[0, 1] > 0.999


def test_bf16_topk_recall_vs_f32(setup):
    """top-100 under bf16 scoring keeps >=95% of the f32 top-100 (the k-th
    boundary may swap near-ties; the retrieval set must be stable)."""
    bundle, index, q = setup
    K = 100
    _, i32 = query_topk(bundle, q, index, k=K, chunk=512, dtype=jnp.float32)
    _, i16 = query_topk(bundle, q, index, k=K, chunk=512, dtype=jnp.bfloat16)
    for b in range(B):
        inter = set(np.asarray(i32[b]).tolist()) & set(np.asarray(i16[b]).tolist())
        assert len(inter) >= int(0.95 * K)


def test_fused_kernel_tracks_xla_on_device(setup):
    """The fused top-k kernel agrees with the XLA bf16 path on the active
    backend (MXU rounding on TPU; interpret mode on CPU)."""
    from evi_rag_tpu.ops.pallas_score import pallas_query_topk_fused

    bundle, index, q = setup
    K = 50
    v_ref, i_ref = query_topk(bundle, q, index, k=K, chunk=512, dtype=jnp.bfloat16)
    v_got, i_got = pallas_query_topk_fused(
        bundle, q, index, k=K, bq=B, tile=256, interpret=INTERPRET
    )
    for b in range(B):
        inter = set(np.asarray(i_ref[b]).tolist()) & set(np.asarray(i_got[b]).tolist())
        assert len(inter) >= int(0.9 * K), (b, len(inter))
    # Score agreement at the top-1 (well away from the k-th boundary).
    np.testing.assert_allclose(
        np.asarray(v_got[:, 0]), np.asarray(v_ref[:, 0]), rtol=0.05, atol=0.05
    )


def test_retriever_bf16_train_step_finite_on_device():
    """One bf16 retriever train step on the active backend: finite loss and
    finite, nonzero grads (hardware-rounding sanity)."""
    from evi_rag_tpu.data.feeder import Bucket, collate_stacked
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset
    from evi_rag_tpu.models.retriever import Retriever
    from evi_rag_tpu.train.retriever_trainer import (
        RetrieverTrainConfig,
        create_train_state,
        make_train_step,
    )

    ds = make_synthetic_dataset(num_samples=8, emb_dim=64, max_nodes=12, seed=6)
    batch = collate_stacked(
        ds.samples, num_shards=1, entity_emb=ds.entity_emb,
        relation_emb=ds.relation_emb, question_emb=ds.question_emb,
        bucket=Bucket(graphs=9, nodes=256, edges=1024),
    )
    model = Retriever(emb_dim=64, hidden_dim=64, dropout_p=0.0, compute_dtype="bfloat16")
    cfg = RetrieverTrainConfig(k_values=(5,))
    state, tx = create_train_state(model, batch, cfg, seed=0)
    step = make_train_step(model, tx, cfg)
    new_state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    deltas = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(state.params))
    ]
    assert all(np.isfinite(d) for d in deltas) and max(deltas) > 0
