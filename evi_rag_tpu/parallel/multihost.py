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
from typing import Any, Callable, Sequence

import jax
import numpy as np


def initialize_distributed(**kwargs: Any) -> None:
    """Idempotent ``jax.distributed.initialize`` (DCN coordination)."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


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
