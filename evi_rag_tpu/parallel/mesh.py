"""Mesh construction and sharding policy.

Replaces the reference's NCCL/Lightning-DDP distribution layer
(``configs/trainer/ddp.yaml``, ``src/data/g_retrieval_datamodule.py:30-39``)
with the JAX SPMD recipe: one ``jax.sharding.Mesh``, NamedShardings on the
batch, and XLA-inserted collectives over ICI.

The framework's first-class strategy -- matching the reference's capability
set (SURVEY §2c) -- is **data parallelism over the graph axis**: every leading
axis of a padded batch (graphs, nodes, edges, pairs) shards over the ``data``
axis; parameters are replicated; gradients are reduced by XLA's automatic
``psum`` when ``jax.grad`` runs under sharding constraints.  The candidate-
edge axis of the serving query path additionally shards over the same axis
for million-triple fan-out (``evi_rag_tpu/ops/query.py``).

Eval on one device maps to a trivial 1-device mesh -- the analog of the
reference's enforced single-GPU eval (``src/eval.py:32-77``) without needing
a separate code path.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, *, devices: Any = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading axis of every batch array over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def global_put(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place one host array under ``sharding``, multi-process safe.

    ``jax.device_put`` rejects shardings that span non-addressable devices
    (a mesh over several processes); ``make_array_from_callback`` builds the
    global array from each process's local shards instead.  Every process
    must hold the full host value (the DP contract here: batches are
    constructed identically from the same seed, params are replicated).
    """
    if sharding.mesh.devices.size == len(sharding.addressable_devices):
        return jax.device_put(x, sharding)
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(getattr(x, "dtype"), jax.dtypes.prng_key):
        data = global_put(jax.random.key_data(x), sharding)
        return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
    host = np.asarray(x)
    return jax.make_array_from_callback(host.shape, sharding, lambda idx: host[idx])


def place_replicated(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree over the mesh (multi-process safe)."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: global_put(x, rep), tree)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a batch pytree with leading-axis sharding over the data mesh.

    ``edge_index`` rows index the *global* node axis, which is itself sharded,
    so gathers become XLA all-gather-free local ops only when a graph's nodes
    and edges land on the same shard -- the feeder guarantees this by packing
    whole graphs and padding each shard independently (see
    ``data/feeder.py::collate_sharded``).
    """
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    canon = {
        np.dtype(np.int64): np.int32,
        np.dtype(np.uint64): np.uint32,
        np.dtype(np.float64): np.float32,
    }

    def place(x):
        # Keep host arrays host-side (canonicalizing 64-bit dtypes the way
        # jnp.asarray would): an eager jnp.asarray here would upload to the
        # default device first, which global_put's multi-process path then
        # pulls straight back to host before re-uploading per-shard -- a
        # wasted H2D+D2H round trip per leaf on the train-step hot path.
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
            x = x.astype(canon.get(x.dtype, x.dtype), copy=False)
        return global_put(x, rep if x.ndim == 0 else sh)

    return jax.tree.map(place, batch)
