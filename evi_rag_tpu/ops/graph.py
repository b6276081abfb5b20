"""Padded multi-graph batches with a reserved padding graph.

The reference batches variable-size per-question subgraphs with PyG's
padding-free ragged concatenation (``src/data/g_retrieval_dataset.py:29-37``
``__inc__`` offsets, explicit ``node_ptr``/``edge_ptr`` everywhere).  Ragged
shapes are hostile to XLA's static-shape compilation model, so the TPU-native
representation is a *padded bucket*:

* a batch has a fixed number of graph slots ``G``, node slots ``N`` and edge
  slots ``E`` (chosen from a bucketing policy so recompilation is rare);
* real graphs are packed contiguously exactly like the reference's flat
  layout (``node_ptr``/``edge_ptr`` are preserved and remain the local<->
  global index contract);
* the **last graph slot is always a padding graph** that owns every padding
  node and padding edge.  Padding edges connect padding nodes only.  With this
  invariant, every per-graph segment reduction is correct *without* extra
  masking: padding contributions land in the padding row and per-node
  diffusion never leaks into real nodes.  (Same trick as jraph's
  ``pad_with_graphs``.)

Masks (``node_mask``/``edge_mask``/``graph_mask``) are still carried for ops
whose identity is not absorbing (softmax/logsumexp over candidates, metric
denominators).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """Core index structure of a padded flat multi-graph batch.

    Shapes: ``G`` graph slots (last = padding graph), ``N`` node slots,
    ``E`` edge slots.
    """

    edge_index: jax.Array  # [2, E] int32, global node ids (head, tail)
    edge_batch: jax.Array  # [E] int32 in [0, G)
    node_batch: jax.Array  # [N] int32 in [0, G)
    node_ptr: jax.Array    # [G+1] int32
    edge_ptr: jax.Array    # [G+1] int32
    node_mask: jax.Array   # [N] bool
    edge_mask: jax.Array   # [E] bool
    graph_mask: jax.Array  # [G] bool (False for the padding graph + unused slots)

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def heads(self) -> jax.Array:
        return self.edge_index[0]

    @property
    def tails(self) -> jax.Array:
        return self.edge_index[1]

    def local_to_global_nodes(self, local_idx: jax.Array, graph_ids: jax.Array) -> jax.Array:
        """Convert per-graph-local node ids to global (flat) node ids."""
        return local_idx + self.node_ptr[graph_ids]

    def global_to_local_nodes(self, global_idx: jax.Array) -> jax.Array:
        return global_idx - self.node_ptr[self.node_batch[global_idx]]


def pad_graphs(
    *,
    edge_index: Sequence[np.ndarray],
    num_nodes: Sequence[int],
    bucket_graphs: int,
    bucket_nodes: int,
    bucket_edges: int,
) -> GraphBatch:
    """Pack a list of graphs into one padded ``GraphBatch`` (host-side, numpy).

    ``edge_index[i]`` is ``[2, E_i]`` with graph-local node ids.  Requires
    ``len(graphs) <= bucket_graphs - 1`` (the last slot is the padding graph).
    """
    n_real = len(num_nodes)
    if len(edge_index) != n_real:
        raise ValueError("edge_index and num_nodes length mismatch")
    if n_real > bucket_graphs - 1:
        raise ValueError(
            f"bucket has {bucket_graphs} graph slots (1 reserved for padding); got {n_real} graphs"
        )
    total_nodes = int(sum(num_nodes))
    total_edges = int(sum(e.shape[1] for e in edge_index))
    if total_nodes > bucket_nodes:
        raise ValueError(f"total nodes {total_nodes} exceed bucket_nodes {bucket_nodes}")
    if total_edges > bucket_edges:
        raise ValueError(f"total edges {total_edges} exceed bucket_edges {bucket_edges}")

    G, N, E = bucket_graphs, bucket_nodes, bucket_edges
    pad_graph = G - 1

    node_ptr = np.zeros(G + 1, dtype=np.int32)
    edge_ptr = np.zeros(G + 1, dtype=np.int32)
    node_batch = np.full(N, pad_graph, dtype=np.int32)
    edge_batch = np.full(E, pad_graph, dtype=np.int32)
    ei = np.zeros((2, E), dtype=np.int32)

    n_off = 0
    e_off = 0
    for g in range(n_real):
        nn = int(num_nodes[g])
        ne = int(edge_index[g].shape[1])
        node_ptr[g + 1] = n_off + nn
        edge_ptr[g + 1] = e_off + ne
        node_batch[n_off : n_off + nn] = g
        edge_batch[e_off : e_off + ne] = g
        if ne:
            e = np.asarray(edge_index[g], dtype=np.int32)
            if e.size and (e.min() < 0 or e.max() >= nn):
                raise ValueError(f"graph {g}: edge_index out of range [0, {nn})")
            ei[:, e_off : e_off + ne] = e + n_off
        n_off += nn
        e_off += ne
    # Empty slots between the last real graph and the padding graph.
    for g in range(n_real, G):
        node_ptr[g + 1] = n_off if g < pad_graph else N
        edge_ptr[g + 1] = e_off if g < pad_graph else E
    node_ptr[G] = N
    edge_ptr[G] = E

    # Padding edges self-loop on the first padding node (or node 0 if none).
    pad_node = min(n_off, N - 1) if N > n_off else max(N - 1, 0)
    ei[:, e_off:] = pad_node

    node_mask = np.zeros(N, dtype=bool)
    node_mask[:n_off] = True
    edge_mask = np.zeros(E, dtype=bool)
    edge_mask[:e_off] = True
    graph_mask = np.zeros(G, dtype=bool)
    graph_mask[:n_real] = True

    return GraphBatch(
        edge_index=jnp.asarray(ei),
        edge_batch=jnp.asarray(edge_batch),
        node_batch=jnp.asarray(node_batch),
        node_ptr=jnp.asarray(node_ptr),
        edge_ptr=jnp.asarray(edge_ptr),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
    )


def scatter_node_values(
    values: Sequence[np.ndarray],
    bucket_nodes: int,
    *,
    fill: float = 0.0,
    dtype=np.float32,
) -> np.ndarray:
    """Concatenate per-graph node arrays and pad the node axis to the bucket."""
    if values:
        cat = np.concatenate([np.asarray(v) for v in values], axis=0)
    else:
        cat = np.zeros((0,), dtype=dtype)
    out_shape = (bucket_nodes,) + cat.shape[1:]
    out = np.full(out_shape, fill, dtype=dtype)
    out[: cat.shape[0]] = cat
    return out
