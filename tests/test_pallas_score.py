"""Fused Pallas score kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bench import build_inputs, make_bundle
from evi_rag_tpu.ops.pallas_score import pallas_query_topk, pallas_score_bidirectional
from evi_rag_tpu.ops.query import TripleIndex, query_topk, score_all

D, H, S, M = 128, 128, 20, 1024

INTERPRET = jax.default_backend() == "cpu"


@pytest.fixture(scope="module")
def setup():
    bundle = jax.tree.map(jnp.asarray, make_bundle(D, H, S, seed=1))
    ins = build_inputs(M, D, S, batch=2, seed=1)
    index = TripleIndex(
        head_repr=jnp.asarray(ins["head"]),
        rel_repr=jnp.asarray(ins["rel"]),
        tail_repr=jnp.asarray(ins["tail"]),
        struct_raw=jnp.asarray(ins["struct"]),
    )
    return bundle, index, jnp.asarray(ins["q"])


def test_prep_weights_fold_is_exact(setup):
    """The serving fold score_head(state_net_1(z)) == z @ (W2 @ w_sc) + b
    is exact algebra in f32 (no nonlinearity between the two layers)."""
    from evi_rag_tpu.ops.nnfn import dense
    from evi_rag_tpu.ops.pallas_score import _prep_weights

    bundle, _, _ = setup
    feats = bundle["features"]
    w = _prep_weights(feats)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(64, H)).astype(np.float32))
    ref = dense(feats["score_head"], dense(feats["state_net_1"], z))[:, 0]
    got = z @ w["w2s"][:, 0] + w["b2s"][0]
    # On TPU, default-precision f32 matmuls run as bf16 passes on the MXU;
    # the two association orders then differ at ~1e-3 relative.
    on_tpu = jax.default_backend() != "cpu"
    tol = dict(rtol=5e-3, atol=5e-3) if on_tpu else dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), **tol)


def test_fused_auto_bq_matches_explicit(setup):
    """The auto bq/tile selection path (bq=None) returns the same top-k as
    an explicit configuration (B pads up to the auto bq)."""
    from evi_rag_tpu.ops.pallas_score import pallas_query_topk_fused

    bundle, index, q = setup
    v_auto, i_auto = pallas_query_topk_fused(
        bundle, q[:3], index, k=8, interpret=True
    )
    v_exp, i_exp = pallas_query_topk_fused(
        bundle, q[:3], index, k=8, bq=4, tile=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(v_auto), np.asarray(v_exp), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i_exp))


def test_kernel_matches_xla_scores(setup):
    bundle, index, q = setup
    ref = np.asarray(score_all(bundle, q[:1], index, dtype=jnp.bfloat16)[0])
    got = np.asarray(
        pallas_score_bidirectional(
            bundle, q[0], index.head_repr, index.rel_repr, index.tail_repr,
            index.struct_raw, tile=256, interpret=INTERPRET,
        )
    )
    scale = np.abs(ref).mean()
    abs_err = np.abs(ref - got)
    # bf16 noise scales with the score magnitude; compare against the
    # distribution scale, not per-element values near zero.
    assert np.quantile(abs_err, 0.999) < 0.05 * scale + 0.02
    assert abs_err.max() < 0.2 * scale + 0.05
    assert np.corrcoef(ref, got)[0, 1] > 0.999


def test_kernel_handles_nonmultiple_tile(setup):
    bundle, index, q = setup
    sub = TripleIndex(
        head_repr=index.head_repr[:777],
        rel_repr=index.rel_repr[:777],
        tail_repr=index.tail_repr[:777],
        struct_raw=index.struct_raw[:777],
    )
    got = np.asarray(
        pallas_score_bidirectional(
            bundle, q[0], sub.head_repr, sub.rel_repr, sub.tail_repr,
            sub.struct_raw, tile=256, interpret=INTERPRET,
        )
    )
    assert got.shape == (777,)
    assert np.isfinite(got).all()


def test_topk_agreement(setup):
    bundle, index, q = setup
    v_ref, i_ref = query_topk(bundle, q, index, k=20, chunk=256)
    v_got, i_got = pallas_query_topk(bundle, q, index, k=20, tile=256, interpret=INTERPRET)
    # Same candidate sets up to bf16 score jitter at the boundary: require
    # >= 90% id overlap and score agreement on the intersection.
    for b in range(q.shape[0]):
        inter = set(np.asarray(i_ref[b]).tolist()) & set(np.asarray(i_got[b]).tolist())
        assert len(inter) >= 18


def test_fused_topk_matches_per_query_kernel(setup):
    """The batched in-kernel-top-k path returns exactly the same (value,
    index) sets as the per-query kernel + lax.top_k (identical bf16 score
    math, so values match bit-for-bit)."""
    from evi_rag_tpu.ops.pallas_score import pallas_query_topk_fused

    bundle, index, q = setup
    K = 20
    v_ref, i_ref = pallas_query_topk(bundle, q, index, k=K, tile=256, interpret=INTERPRET)
    v_got, i_got = pallas_query_topk_fused(
        bundle, q, index, k=K, bq=2, tile=256, interpret=INTERPRET
    )
    assert v_got.shape == (q.shape[0], K) and i_got.dtype == np.int32
    for b in range(q.shape[0]):
        ref = {int(i): float(v) for i, v in zip(np.asarray(i_ref[b]), np.asarray(v_ref[b]))}
        got = {int(i): float(v) for i, v in zip(np.asarray(i_got[b]), np.asarray(v_got[b]))}
        # The fused kernel's factorized math reassociates bf16 products, so
        # scores carry ~1e-3 jitter; candidate sets must agree up to the
        # k-th boundary and values must match to bf16 tolerance.
        common = set(ref) & set(got)
        assert len(common) >= K - 2, (b, set(ref) ^ set(got))
        for i in common:
            assert abs(ref[i] - got[i]) < 0.01 + 0.01 * abs(ref[i]), (b, i)
    # Values come back sorted descending.
    assert (np.diff(np.asarray(v_got), axis=1) <= 1e-6).all()


def test_fused_topk_query_padding(setup):
    """B not divisible by bq pads internally and strips the pad rows."""
    from evi_rag_tpu.ops.pallas_score import pallas_query_topk_fused

    bundle, index, q = setup
    v1, i1 = pallas_query_topk_fused(bundle, q[:1], index, k=8, bq=2, tile=256, interpret=INTERPRET)
    v2, i2 = pallas_query_topk_fused(bundle, q, index, k=8, bq=2, tile=256, interpret=INTERPRET)
    assert v1.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(v1[0]), np.asarray(v2[0]), rtol=1e-5, atol=1e-5)


def test_fused_topk_nonmultiple_candidates(setup):
    """Right-pad candidates are masked out of the top-k (indices < M)."""
    from evi_rag_tpu.ops.pallas_score import pallas_query_topk_fused

    bundle, index, q = setup
    sub = TripleIndex(
        head_repr=index.head_repr[:777], rel_repr=index.rel_repr[:777],
        tail_repr=index.tail_repr[:777], struct_raw=index.struct_raw[:777],
    )
    v, i = pallas_query_topk_fused(bundle, q, sub, k=16, bq=2, tile=256, interpret=INTERPRET)
    assert int(np.asarray(i).max()) < 777
    assert np.isfinite(np.asarray(v)).all()


def test_per_question_kernel_matches_xla_path(setup):
    """The per-question streaming kernel returns the same candidate sets and
    scores (to bf16 tolerance) as ``query_topk_per_question`` -- the serving
    routing contract for large buckets."""
    from evi_rag_tpu.ops.pallas_score import pallas_per_question_topk
    from evi_rag_tpu.ops.query import query_topk_per_question

    bundle, index, q = setup
    G, M = q.shape[0], index.num_candidates
    rng = np.random.default_rng(7)
    # Per-question candidate tensors: shuffle the pooled index per question
    # and give each question a different valid length (padding semantics).
    perm = np.stack([rng.permutation(M) for _ in range(G)])
    take = lambda a: jnp.asarray(np.asarray(a)[perm])   # [G, M, ...]
    h, r, t, s = map(take, (index.head_repr, index.rel_repr,
                            index.tail_repr, index.struct_raw))
    valid_len = [M, M - 300]
    mask = np.zeros((G, M), bool)
    for g, n in enumerate(valid_len):
        mask[g, :n] = True
    mask = jnp.asarray(mask)

    K = 20
    v_ref, i_ref = query_topk_per_question(
        bundle, q, h, r, t, s, mask, k=K, dtype=jnp.bfloat16
    )
    v_got, i_got = pallas_per_question_topk(
        bundle, q, h, r, t, s, mask, k=K, tile=256, interpret=INTERPRET
    )
    assert v_got.shape == (G, K) and i_got.dtype == np.int32
    for g in range(G):
        ref = {int(i): float(v) for i, v in zip(np.asarray(i_ref[g]), np.asarray(v_ref[g]))}
        got = {int(i): float(v) for i, v in zip(np.asarray(i_got[g]), np.asarray(v_got[g]))}
        common = set(ref) & set(got)
        assert len(common) >= K - 2, (g, set(ref) ^ set(got))
        for i in common:
            assert abs(ref[i] - got[i]) < 0.01 + 0.01 * abs(ref[i]), (g, i)
        # No masked (padding) candidate ever surfaces.
        assert max(got) < valid_len[g]
    assert (np.diff(np.asarray(v_got), axis=1) <= 1e-6).all()


def test_per_question_kernel_fewer_candidates_than_k():
    """Questions with fewer valid edges than k pad the tail with -inf."""
    from bench import build_inputs, make_bundle
    from evi_rag_tpu.ops.pallas_score import pallas_per_question_topk

    bundle = jax.tree.map(jnp.asarray, make_bundle(D, H, S, seed=3))
    ins = build_inputs(64, D, S, batch=1, seed=3)
    to_g = lambda a: jnp.asarray(a)[None]
    mask = np.zeros((1, 64), bool)
    mask[0, :5] = True
    v, i = pallas_per_question_topk(
        bundle, jnp.asarray(ins["q"]), to_g(ins["head"]), to_g(ins["rel"]),
        to_g(ins["tail"]), to_g(ins["struct"]), jnp.asarray(mask),
        k=16, tile=32, interpret=INTERPRET,
    )
    v = np.asarray(v)
    assert np.isfinite(v[0, :5]).all()
    assert np.isneginf(v[0, 5:]).all()
    assert int(np.asarray(i)[0, :5].max()) < 5
