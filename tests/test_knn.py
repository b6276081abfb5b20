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


@pytest.mark.parametrize("path", ["oneshot", "chunked"])
@pytest.mark.parametrize("metric", ["dot", "cosine", "l2"])
def test_knn_matches_bruteforce(data, metric, path, monkeypatch):
    """Both the one-shot and the chunked-scan path verify directly against
    the numpy brute-force oracle (not just against each other)."""
    import evi_rag_tpu.ops.knn as knn_mod

    q, t = data
    if path == "chunked":
        monkeypatch.setattr(knn_mod, "_ONESHOT_BYTES", 0)
        vals, ids = knn_mod.knn_topk.__wrapped__(
            jnp.asarray(q), jnp.asarray(t), k=K, chunk=256, metric=metric,
            dtype=jnp.float32,
        )
    else:
        vals, ids = knn_topk(jnp.asarray(q), jnp.asarray(t), k=K, metric=metric,
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


@pytest.mark.parametrize("metric", ["dot", "cosine", "l2"])
def test_knn_chunked_matches_oneshot(data, metric, monkeypatch):
    """The chunked-scan path (forced by a zero one-shot budget) must return
    the same top-k as the one-shot matmul + single selection path."""
    import evi_rag_tpu.ops.knn as knn_mod

    q, t = data
    v1, i1 = knn_topk(jnp.asarray(q), jnp.asarray(t), k=K, metric=metric,
                      dtype=jnp.float32)
    monkeypatch.setattr(knn_mod, "_ONESHOT_BYTES", 0)
    v2, i2 = knn_mod.knn_topk.__wrapped__(
        jnp.asarray(q), jnp.asarray(t), k=K, chunk=256, metric=metric,
        dtype=jnp.float32,
    )
    for b in range(B):
        assert set(np.asarray(i1[b]).tolist()) == set(np.asarray(i2[b]).tolist())
    # ids are the exactness contract (asserted above); values differ by f32
    # reassociation between the one-shot and per-chunk matmul groupings.
    np.testing.assert_allclose(np.sort(np.asarray(v1)), np.sort(np.asarray(v2)),
                               rtol=5e-3 if _ON_TPU else 1e-3)


def test_knn_approx_overlaps_exact(data, monkeypatch):
    """approx (lax.approx_max_k, TPU-KNN's operator at recall_target=0.95)
    must recover the bulk of the exact top-k, in both one-shot and chunked
    form (the chunked path's cross-chunk 2k merge stays exact)."""
    import evi_rag_tpu.ops.knn as knn_mod

    q, t = data
    _, exact = knn_topk(jnp.asarray(q), jnp.asarray(t), k=K, metric="cosine",
                        dtype=jnp.float32)
    _, approx = knn_topk(jnp.asarray(q), jnp.asarray(t), k=K, metric="cosine",
                         dtype=jnp.float32, method="approx")
    monkeypatch.setattr(knn_mod, "_ONESHOT_BYTES", 0)
    _, approx_c = knn_mod.knn_topk.__wrapped__(
        jnp.asarray(q), jnp.asarray(t), k=K, chunk=256, metric="cosine",
        dtype=jnp.float32, method="approx",
    )
    for got in (approx, approx_c):
        for b in range(B):
            hit = len(set(np.asarray(exact[b]).tolist())
                      & set(np.asarray(got[b]).tolist()))
            assert hit >= int(0.8 * K)


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
