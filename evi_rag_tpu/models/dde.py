"""Directional Diffusion Encoding (DDE) as pure segment-mean message passing.

Re-designs the reference's ``DDE``/``PEConv`` (``src/models/components/
graph.py:13-74``): K rounds of mean-aggregation over the directed edge list,
forward (head->tail) and reverse (tail->head).  The reference implements this
through torch_geometric ``MessagePassing`` with native scatter kernels; here
each round is one gather + one masked ``segment_mean`` over the flat padded
edge axis -- a single fused XLA scatter per round, and padding edges cannot
leak because they only connect padding nodes (see ``ops/graph.py``).

DDE is parameter-free; rounds are capped at 4 per direction like the
reference (``graph.py:10``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from evi_rag_tpu.ops.segment import segment_mean

MAX_DDE_ROUNDS = 4


def dde_diffuse(
    x: jax.Array,            # [N, C] node features (e.g. topic one-hot)
    edge_index: jax.Array,   # [2, E]
    *,
    num_rounds: int,
    num_reverse_rounds: int,
    edge_mask: jax.Array | None = None,
) -> list[jax.Array]:
    """Return ``num_rounds + num_reverse_rounds`` diffused feature maps.

    Forward round: node u receives the mean of x over in-edges (messages flow
    head -> tail).  Reverse rounds flow tail -> head.  Matches reference
    ``DDE.forward`` ordering: all forward rounds first, then all reverse.
    """
    if num_rounds > MAX_DDE_ROUNDS or num_reverse_rounds > MAX_DDE_ROUNDS:
        raise ValueError(
            f"DDE supports at most {MAX_DDE_ROUNDS} rounds per direction; "
            f"got {num_rounds}/{num_reverse_rounds}"
        )
    heads, tails = edge_index[0], edge_index[1]
    num_nodes = x.shape[0]

    def one_round(h: jax.Array, src: jax.Array, dst: jax.Array) -> jax.Array:
        msgs = h[src]
        return segment_mean(msgs, dst, num_nodes, mask=edge_mask)

    outs: list[jax.Array] = []
    h = x
    for _ in range(num_rounds):
        h = one_round(h, heads, tails)
        outs.append(h)
    h = x
    for _ in range(num_reverse_rounds):
        h = one_round(h, tails, heads)
        outs.append(h)
    return outs


def build_node_struct_features(
    topic_one_hot: jax.Array,  # [N, C]
    edge_index: jax.Array,     # [2, E]
    *,
    num_rounds: int,
    num_reverse_rounds: int,
    edge_mask: jax.Array | None = None,
) -> jax.Array:
    """Stack raw + diffused topic features into ``[N, C*(1+R+Rr)]``.

    Matches the reference's interleaved layout
    ``torch.stack(feats, dim=-1).reshape(N, -1)``
    (``retriever.py:546-553``): feature order is
    ``[c0@raw, c0@f1, ..., c0@rK, c1@raw, ...]`` per topic channel.
    """
    feats = [topic_one_hot] + dde_diffuse(
        topic_one_hot,
        edge_index,
        num_rounds=num_rounds,
        num_reverse_rounds=num_reverse_rounds,
        edge_mask=edge_mask,
    )
    stacked = jnp.stack(feats, axis=-1)  # [N, C, 1+R+Rr]
    return stacked.reshape(stacked.shape[0], -1)
