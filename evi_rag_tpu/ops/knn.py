"""Exact k-nearest-neighbor search over device-resident embedding tables.

BASELINE.json names "exact kNN over the KG embedding table as tiled
dot-product with streaming top-k across the ICI mesh" as a build target
(used for entity linking / seed expansion at Freebase scale).  Design follows
the TPU-KNN recipe (arxiv 2206.14286): the score phase is a pure [B, D] x
[D, C] matmul -- peak-FLOP/s MXU work -- and selection is the actual cost
(``lax.top_k`` lowers to a sort).  Small problems (score matrix + sort
temporaries within ``_ONESHOT_BYTES``) run as ONE matmul + one selection;
beyond that a chunked scan with a running merge keeps live memory at
O(chunk + k).  ``chunk`` only affects the scanned fallback.

Metrics: dot (MIPS), cosine, or negative-L2.  ``knn_topk_sharded`` shards
the table axis over a mesh: each device keeps a local top-k and the merge is
one [k]-row all-gather over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_METRICS = ("dot", "cosine", "l2")


def _prep(table: jax.Array, metric: str, dtype) -> jax.Array:
    if metric == "cosine":
        table = table / jnp.maximum(jnp.linalg.norm(table, axis=-1, keepdims=True), 1e-12)
    return table.astype(dtype)


def _scores(q: jax.Array, chunk: jax.Array, metric: str, chunk_sq: jax.Array | None) -> jax.Array:
    s = jnp.dot(q, chunk.T, preferred_element_type=jnp.float32)  # [B, C]
    if metric == "l2":
        # -||q - c||^2 = 2 q.c - ||c||^2 (- ||q||^2, constant per query).
        s = 2.0 * s - chunk_sq[None, :]
    return s


# One-shot live-memory budget: the [B, V] f32 score matrix PLUS the sort
# temporaries lax.top_k materializes (a value copy + an int32 index array,
# ~3x the matrix) must fit.  512 MB keeps worst-case one-shot residency
# well under the 16 GB v5e HBM even next to a large resident table.
_ONESHOT_BYTES = 512 * 1024 * 1024


@partial(jax.jit, static_argnames=("k", "chunk", "metric", "dtype", "method"))
def knn_topk(
    queries: jax.Array,   # [B, D]
    table: jax.Array,     # [V, D]
    *,
    k: int,
    chunk: int = 65536,
    metric: str = "dot",
    dtype=jnp.bfloat16,
    method: str = "exact",
) -> tuple[jax.Array, jax.Array]:
    """Top-k: ([B, k] scores, [B, k] table row ids).

    The matmul is bandwidth-bound (~0.7 ms for 262k x 1024 bf16 on a v5e);
    the SELECTION dominates — ``lax.top_k`` lowers to a sort (~11 ms over
    [64, 262k]).  Measured @262k x 1024, B=64, k=100:

    - ``method="exact"`` (default): one-shot matmul + single ``top_k`` when
      the [B, V] f32 score matrix fits ``_ONESHOT_BYTES``, else a chunked
      scan with a running merge.  26 ms at the old chunk=8192 defaults ->
      12 ms one-shot (15 ms chunked at 65536).
    - ``method="approx"``: ``lax.approx_max_k`` (the TPU-KNN paper's
      PartialReduce operator, arXiv:2206.14286, recall_target=0.95) — 7 ms.
      Entity-linking/seed-expansion callers that tolerate ~5% tail loss
      should prefer this at scale.
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}")
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be exact|approx, got {method!r}")
    v, d = table.shape
    b = queries.shape[0]
    tbl = _prep(table, metric, dtype)
    q = queries.astype(dtype)
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    neg = jnp.float32(-jnp.inf)

    def select(s):  # [B, n] scores -> ([B, k] vals, [B, k] positions)
        if method == "approx":
            return jax.lax.approx_max_k(s, k, recall_target=0.95)
        return jax.lax.top_k(s, k)

    if 3 * b * v * 4 <= _ONESHOT_BYTES:  # 3x: scores + top_k's value/index temps
        sq = jnp.sum(tbl.astype(jnp.float32) ** 2, axis=-1) if metric == "l2" else None
        s = _scores(q, tbl, metric, sq)
        top_v, top_i = select(s)
        return top_v, top_i.astype(jnp.int32)

    num_chunks = -(-v // chunk)
    pad = num_chunks * chunk - v
    tbl = jnp.pad(tbl, ((0, pad), (0, 0)))
    sq = jnp.sum(tbl.astype(jnp.float32) ** 2, axis=-1) if metric == "l2" else None

    tiles = tbl.reshape(num_chunks, chunk, d)
    sq_tiles = sq.reshape(num_chunks, chunk) if sq is not None else jnp.zeros((num_chunks, chunk))
    valid = (jnp.arange(num_chunks * chunk) < v).reshape(num_chunks, chunk)

    def body(carry, xs):
        top_v, top_i = carry
        tile, sq_t, ok, base = xs
        s = _scores(q, tile, metric, sq_t)
        s = jnp.where(ok[None, :], s, neg)
        ids = jnp.broadcast_to((base + jnp.arange(chunk, dtype=jnp.int32))[None, :], (b, chunk))
        if method == "approx":
            # Approximate only the chunk-local selection; the cross-chunk
            # merge of 2k entries stays exact so recall loss never compounds
            # on the running buffer.
            cv, cp = jax.lax.approx_max_k(s, k, recall_target=0.95)
            s = cv
            ids = jnp.take_along_axis(ids, cp, axis=1)
        all_v = jnp.concatenate([top_v, s], axis=1)
        all_i = jnp.concatenate([top_i, ids], axis=1)
        new_v, pos = jax.lax.top_k(all_v, k)
        return (new_v, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (jnp.full((b, k), neg), jnp.full((b, k), -1, jnp.int32))
    bases = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (top_v, top_i), _ = jax.lax.scan(body, init, (tiles, sq_tiles, valid, bases))
    return top_v, top_i


def knn_topk_sharded(
    queries: jax.Array,
    table: jax.Array,     # sharded [V, D] over the mesh data axis
    *,
    mesh,
    k: int,
    chunk: int = 8192,
    metric: str = "dot",
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Mesh-sharded exact kNN: local top-k per shard + all-gather k-merge."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    v = table.shape[0]
    if v % n_dev != 0:
        raise ValueError(f"table rows {v} must divide evenly over {n_dev} devices")
    local_v = v // n_dev

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis)), out_specs=(P(), P()), check_vma=False,
    )
    def run(q, tbl):
        val, idx = knn_topk(q, tbl, k=k, chunk=min(chunk, local_v), metric=metric, dtype=dtype)
        idx = idx + jax.lax.axis_index(axis).astype(jnp.int32) * local_v
        vs = jax.lax.all_gather(val, axis, axis=0)   # [n_dev, B, k]
        is_ = jax.lax.all_gather(idx, axis, axis=0)
        b = q.shape[0]
        vs = jnp.transpose(vs, (1, 0, 2)).reshape(b, -1)
        is_ = jnp.transpose(is_, (1, 0, 2)).reshape(b, -1)
        top_v, pos = jax.lax.top_k(vs, k)
        return top_v, jnp.take_along_axis(is_, pos, axis=1)

    return run(queries, table)
