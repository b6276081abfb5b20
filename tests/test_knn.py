"""Exact kNN vs numpy brute force, all metrics, plus the sharded variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

# On real TPU hardware, f32 matmuls accumulate differently than the CPU
# backend (MXU passes); exactness assertions get a hardware tolerance.
import jax as _jax

_ON_TPU = _jax.default_backend() != "cpu"


from evi_rag_tpu.ops.knn import knn_topk, knn_topk_sharded
from evi_rag_tpu.parallel.mesh import make_mesh

B, V, D, K = 4, 1000, 64, 10


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return (
        rng.normal(size=(B, D)).astype(np.float32),
        rng.normal(size=(V, D)).astype(np.float32),
    )


def _brute(q, t, metric):
    if metric == "dot":
        return q @ t.T
    if metric == "cosine":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        tn = t / np.linalg.norm(t, axis=1, keepdims=True)
        return qn @ tn.T
    return -((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)


@pytest.mark.parametrize("metric", ["dot", "cosine", "l2"])
def test_knn_matches_bruteforce(data, metric):
    q, t = data
    vals, ids = knn_topk(jnp.asarray(q), jnp.asarray(t), k=K, chunk=256, metric=metric,
                         dtype=jnp.float32)
    scores = _brute(q, t, metric)
    want_ids = np.argsort(-scores, axis=1)[:, :K]
    got = np.asarray(ids)
    for b in range(B):
        # Allow order differences on exact ties only.
        assert set(got[b].tolist()) == set(want_ids[b].tolist())
    if metric == "l2":
        # scores differ from brute by the per-query ||q||^2 constant; ranks matched above.
        return
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(scores, want_ids, axis=1), rtol=5e-3 if _ON_TPU else 1e-4, atol=5e-3 if _ON_TPU else 1e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_knn_sharded_matches_single(data):
    q, t = data
    t8 = t[:960]  # divisible by 8
    v_ref, i_ref = knn_topk(jnp.asarray(q), jnp.asarray(t8), k=K, chunk=128, dtype=jnp.float32)
    mesh = make_mesh(8)
    t_sh = jax.device_put(jnp.asarray(t8), NamedSharding(mesh, P("data")))
    v_got, i_got = knn_topk_sharded(jnp.asarray(q), t_sh, mesh=mesh, k=K, chunk=128,
                                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref), rtol=5e-3 if _ON_TPU else 1e-5, atol=5e-3 if _ON_TPU else 0)
    for b in range(B):
        assert set(np.asarray(i_got[b]).tolist()) == set(np.asarray(i_ref[b]).tolist())


def test_build_triple_index():
    """build_triple_index pre-applies projections + non-text override."""
    import jax.numpy as jnp

    from bench import make_bundle
    from evi_rag_tpu.ops.query import build_triple_index

    rng = np.random.default_rng(0)
    Dd = 32
    bundle = jax.tree.map(jnp.asarray, make_bundle(Dd, Dd, 20, seed=3))
    ent = jnp.asarray(rng.normal(size=(20, Dd)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(6, Dd)).astype(np.float32))
    nontext = jnp.zeros(20, bool).at[3].set(True)
    heads = jnp.asarray([0, 3, 5])
    rels = jnp.asarray([0, 1, 2])
    tails = jnp.asarray([3, 5, 0])
    struct = jnp.asarray(rng.normal(size=(3, 20)).astype(np.float32))
    idx = build_triple_index(
        bundle, entity_emb=ent, relation_emb=rel, nontext_mask=nontext,
        heads=heads, rels=rels, tails=tails, struct_raw=struct,
    )
    assert idx.head_repr.shape == (3, Dd)
    # Projection applied: row equals tanh(dense(ent_row)).
    feats = bundle["features"]
    want = np.tanh(np.asarray(ent[0]) @ np.asarray(feats["entity_proj"]["proj"]["kernel"])
                   + np.asarray(feats["entity_proj"]["proj"]["bias"]))
    np.testing.assert_allclose(np.asarray(idx.head_repr[0]), want, rtol=5e-3 if _ON_TPU else 1e-5, atol=5e-3 if _ON_TPU else 0)
    # Non-text entity (id 3) uses the learned non-text embedding for both
    # occurrences (head of candidate 1, tail of candidate 0).
    np.testing.assert_allclose(
        np.asarray(idx.head_repr[1]), np.asarray(idx.tail_repr[0]), rtol=1e-6
    )
