"""Multi-host glue: object gather + main-process guards.

Replaces the reference's ``torch.distributed`` object collectives
(``all_gather_object`` artifact merges in ``retriever_topk_edge_writer.py:
449-462``, ``reasoner_module.py:232-243``; rank-0 saves in
``g_agent_materializer.py:100-105``) with the JAX multi-host equivalents:

* ``initialize_distributed`` -- ``jax.distributed.initialize`` over DCN;
* ``gather_records`` -- every process contributes a list of JSON-able
  records; process 0 receives the deduplicated concatenation
  (``multihost_utils.process_allgather`` on length-prefixed byte buffers);
* ``main_process_only`` -- the ``process_index == 0`` write guard.

On a single process everything degrades to the identity.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Sequence

import jax
import numpy as np

_distributed_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs: Any,
) -> None:
    """Idempotent ``jax.distributed.initialize`` (DCN coordination).

    MUST run before any backend-touching JAX call (``jax.devices()``,
    ``jax.process_count()``, any computation): querying the backend first
    initializes the local runtime, after which distributed init silently
    degrades to a no-op.  Coordination parameters come from explicit
    arguments or the ``EVI_COORDINATOR_ADDRESS`` / ``EVI_NUM_PROCESSES`` /
    ``EVI_PROCESS_ID`` environment (set ``EVI_DISTRIBUTED=1`` to rely on
    JAX cluster auto-detection, e.g. on TPU pods).  With none of these the
    call is a single-process no-op.  Errors propagate — a misconfigured
    multi-host launch must fail loudly, not fall back to 1 process.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return
    coordinator_address = coordinator_address or os.environ.get("EVI_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("EVI_NUM_PROCESSES"):
        num_processes = int(os.environ["EVI_NUM_PROCESSES"])
    if process_id is None and os.environ.get("EVI_PROCESS_ID"):
        process_id = int(os.environ["EVI_PROCESS_ID"])
    auto_detect = os.environ.get("EVI_DISTRIBUTED", "") not in ("", "0")
    if coordinator_address is None and not auto_detect:
        return  # single-process run: nothing to coordinate
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _distributed_initialized = True


def is_main_process() -> bool:
    return jax.process_index() == 0


def main_process_only(fn: Callable) -> Callable:
    @functools.wraps(fn)
    def wrapped(*args: Any, **kwargs: Any):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapped


def gather_records(
    records: Sequence[dict[str, Any]],
    *,
    dedup_key: Callable[[dict], Any] | None = None,
) -> list[dict[str, Any]]:
    """All-processes record merge; result identical on every process.

    Records are serialized to JSON bytes, padded to the max length across
    processes, and exchanged with ``process_allgather``; the merge
    deduplicates by ``dedup_key`` (last wins), matching the reference's
    post-gather dedup (``reasoner_module.py:244-253``).
    """
    if jax.process_count() == 1:
        merged = list(records)
    else:
        from jax.experimental import multihost_utils

        payload = json.dumps(list(records)).encode()
        length = np.asarray([len(payload)], dtype=np.int64)
        max_len = int(multihost_utils.process_allgather(length).max())
        buf = np.zeros(max_len, dtype=np.uint8)
        buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
        lengths = multihost_utils.process_allgather(length)  # [P, 1]
        buffers = multihost_utils.process_allgather(buf)     # [P, max_len]
        merged = []
        for p in range(buffers.shape[0]):
            raw = bytes(buffers[p, : int(lengths[p, 0])])
            merged.extend(json.loads(raw))
    if dedup_key is not None:
        seen: dict[Any, dict] = {}
        for r in merged:
            seen[dedup_key(r)] = r
        merged = list(seen.values())
    return merged
