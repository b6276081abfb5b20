"""Segment-op correctness vs numpy references (incl. empty segments, masks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.ops import (
    NEG_INF,
    segment_argmax,
    segment_count,
    segment_logsumexp,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)

S = 5  # segments; segment 3 left intentionally empty


def _case(rng, n=64):
    data = rng.normal(size=n).astype(np.float32) * 3
    seg = rng.integers(0, S, size=n).astype(np.int32)
    seg[seg == 3] = 2  # make segment 3 empty
    mask = rng.random(n) > 0.3
    return data, seg, mask


def _np_grouped(data, seg, mask, fn, empty):
    out = []
    for s in range(S):
        sel = (seg == s) & mask
        out.append(fn(data[sel]) if sel.any() else empty)
    return np.array(out, dtype=np.float32)


def test_segment_sum_mean_count(rng):
    data, seg, mask = _case(rng)
    got = segment_sum(jnp.asarray(data), jnp.asarray(seg), S, mask=jnp.asarray(mask))
    want = _np_grouped(data, seg, mask, np.sum, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    got_mean = segment_mean(jnp.asarray(data), jnp.asarray(seg), S, mask=jnp.asarray(mask))
    want_mean = _np_grouped(data, seg, mask, np.mean, 0.0)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-5, atol=1e-5)

    got_cnt = segment_count(jnp.asarray(seg), S, mask=jnp.asarray(mask))
    want_cnt = _np_grouped(data, seg, mask, len, 0.0)
    np.testing.assert_allclose(got_cnt, want_cnt)


def test_segment_max_min(rng):
    data, seg, mask = _case(rng)
    got = segment_max(jnp.asarray(data), jnp.asarray(seg), S, mask=jnp.asarray(mask))
    want = _np_grouped(data, seg, mask, np.max, NEG_INF)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    big = float(jnp.finfo(jnp.float32).max)
    got_min = segment_min(jnp.asarray(data), jnp.asarray(seg), S, mask=jnp.asarray(mask))
    want_min = _np_grouped(data, seg, mask, np.min, big)
    np.testing.assert_allclose(got_min, want_min, rtol=1e-6)


def test_segment_logsumexp(rng):
    data, seg, mask = _case(rng)
    got = segment_logsumexp(jnp.asarray(data), jnp.asarray(seg), S, mask=jnp.asarray(mask))
    want = _np_grouped(
        data, seg, mask, lambda x: np.log(np.sum(np.exp(x - x.max()))) + x.max(), NEG_INF
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.isfinite(got[np.isfinite(want)]).all()


def test_segment_logsumexp_extreme_values(rng):
    # Large magnitudes must not overflow (max-shift discipline).
    data = np.array([1000.0, 1000.0, -1000.0, 500.0], dtype=np.float32)
    seg = np.array([0, 0, 1, 1], dtype=np.int32)
    got = segment_logsumexp(jnp.asarray(data), jnp.asarray(seg), 2)
    np.testing.assert_allclose(got[0], 1000.0 + np.log(2.0), rtol=1e-6)
    np.testing.assert_allclose(got[1], 500.0, rtol=1e-6)


def test_segment_softmax(rng):
    data, seg, mask = _case(rng)
    got = np.asarray(segment_softmax(jnp.asarray(data), jnp.asarray(seg), S, mask=jnp.asarray(mask)))
    # Masked lanes are exactly zero.
    assert (got[~mask] == 0).all()
    # Per-segment sums are 1 where the segment is non-empty.
    for s in range(S):
        sel = (seg == s) & mask
        if sel.any():
            np.testing.assert_allclose(got[seg == s].sum(), 1.0, rtol=1e-5)
    # Matches dense softmax within one segment.
    sel = (seg == 0) & mask
    if sel.any():
        x = data[sel]
        ref = np.exp(x - x.max()) / np.exp(x - x.max()).sum()
        np.testing.assert_allclose(got[sel], ref, rtol=1e-5)


def test_segment_argmax_tiebreak(rng):
    data = np.array([1.0, 5.0, 5.0, 2.0, 7.0, 7.0], dtype=np.float32)
    seg = np.array([0, 0, 0, 1, 1, 1], dtype=np.int32)
    mx, arg = segment_argmax(jnp.asarray(data), jnp.asarray(seg), 3)
    np.testing.assert_allclose(mx[:2], [5.0, 7.0])
    assert int(arg[0]) == 1  # lowest index among ties
    assert int(arg[1]) == 4
    assert mx[2] == NEG_INF and int(arg[2]) == 0  # empty segment


def test_segment_argmax_mask(rng):
    data = np.array([9.0, 5.0, 3.0], dtype=np.float32)
    seg = np.zeros(3, dtype=np.int32)
    mask = np.array([False, True, True])
    mx, arg = segment_argmax(jnp.asarray(data), jnp.asarray(seg), 1, mask=jnp.asarray(mask))
    assert float(mx[0]) == 5.0 and int(arg[0]) == 1


def test_ops_jittable(rng):
    data, seg, mask = _case(rng)

    @jax.jit
    def f(d, s, m):
        a = segment_sum(d, s, S, mask=m)
        b = segment_logsumexp(d, s, S, mask=m)
        c, i = segment_argmax(d, s, S, mask=m)
        return a, b, c, i

    out = f(jnp.asarray(data), jnp.asarray(seg), jnp.asarray(mask))
    assert all(np.asarray(o).shape == (S,) for o in out)


def test_segment_ops_2d_features(rng):
    data = rng.normal(size=(16, 8)).astype(np.float32)
    seg = rng.integers(0, S, size=16).astype(np.int32)
    mask = rng.random(16) > 0.5
    got = segment_mean(jnp.asarray(data), jnp.asarray(seg), S, mask=jnp.asarray(mask))
    for s in range(S):
        sel = (seg == s) & mask
        want = data[sel].mean(axis=0) if sel.any() else np.zeros(8, np.float32)
        np.testing.assert_allclose(got[s], want, rtol=1e-5, atol=1e-5)
