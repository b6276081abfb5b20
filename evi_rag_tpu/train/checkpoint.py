"""Checkpointing with the cross-model parity-meta handshake.

Reference behaviours reproduced (SURVEY §5 "checkpoint/resume"):

* best-on-monitor + last checkpoint retention (Lightning ``ModelCheckpoint``);
* the retriever writes a ``parity_meta`` feature-geometry contract into its
  checkpoint (reference ``retriever.py:143-155``);
* the GFlowNet embedder loads retriever weights + parity_meta to rebuild
  identical feature geometry (``gflownet_embedder.py:634-871``), and GFlowNet
  checkpoints re-export ``retriever_meta`` incl. a sha256 of the retriever
  checkpoint so eval can deferred-init without the original file
  (``gflownet_module.py:109-124``).

Design change vs the reference: instead of key-prefix archaeology over a raw
state dict, the retriever exports a *typed feature-extractor bundle*
(``export_retriever_features``) -- the exact parameter subtree the embedder
needs -- so the handshake is a schema, not a convention.

Orbax handles the array tree; a JSON sidecar carries metadata.
"""

from __future__ import annotations

import hashlib
import json
import pathlib
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

META_FILENAME = "meta.json"
SCHEMA_VERSION = 1

# Parameter names the GFlowNet embedder needs from a retriever checkpoint.
RETRIEVER_FEATURE_KEYS = (
    "entity_proj",
    "relation_proj",
    "query_proj",
    "non_text_entity_emb",
    "q_gate",
    "q_bias",
    "struct_proj",
    "struct_norm",
    "struct_gate",
    "state_net_0",
    "state_norm",
    "state_net_1",
    "score_head",
)


def params_digest(params: Any) -> str:
    """Stable sha256 over parameter bytes (path-sorted)."""
    h = hashlib.sha256()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in sorted(flat, key=lambda kv: jax.tree_util.keystr(kv[0])):
        h.update(jax.tree_util.keystr(path).encode())
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def _save_checkpointer() -> ocp.Checkpointer:
    """Checkpointer whose save involves only process 0 (the reference's
    rank-0-saves semantics, ``g_agent_materializer.py:100-105``): in
    multi-process runs orbax otherwise treats save as a collective over a
    shared path and barriers across all hosts."""
    if jax.process_count() > 1:
        return ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}
            ),
        )
    return ocp.StandardCheckpointer()


def save_checkpoint(
    path: str | pathlib.Path,
    params: Any,
    *,
    meta: dict[str, Any] | None = None,
    opt_state: Any = None,
    step: int | None = None,
) -> str:
    """Save params (+ optional opt state) and metadata; returns the digest.

    Multi-process: every process may call this with the same (shared) path;
    only process 0 writes.  Params are replicated in DP training, so the
    digest every caller returns is identical.
    """
    path = pathlib.Path(path).absolute()
    tree: dict[str, Any] = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    # Materialize to host numpy: orbax refuses host-local jax.Arrays in
    # multi-process runs, and train-state params are replicated (small), so
    # a host copy is both safe and cheap.
    tree = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)
    digest = params_digest(tree["params"])
    if jax.process_count() > 1 and jax.process_index() != 0:
        return digest
    path.parent.mkdir(parents=True, exist_ok=True)
    with _save_checkpointer() as ckptr:
        ckptr.save(path / "state", tree, force=True)
    payload = {
        "schema_version": SCHEMA_VERSION,
        "params_sha256": digest,
        "step": step,
        "has_opt_state": opt_state is not None,
        **(meta or {}),
    }
    (path / META_FILENAME).write_text(json.dumps(payload, indent=2, default=str))
    return digest


def load_checkpoint(
    path: str | pathlib.Path,
    *,
    example: Any = None,
    strict_digest: bool = True,
) -> tuple[Any, dict[str, Any]]:
    """Load (tree, meta); verifies the params digest when strict."""
    path = pathlib.Path(path).absolute()
    meta_path = path / META_FILENAME
    if not meta_path.exists():
        raise FileNotFoundError(f"checkpoint meta missing: {meta_path}")
    meta = json.loads(meta_path.read_text())
    if meta.get("schema_version") != SCHEMA_VERSION:
        raise ValueError(
            f"checkpoint schema_version {meta.get('schema_version')} != {SCHEMA_VERSION}"
        )
    import logging as _logging

    class _SilenceTargetWarning(_logging.Filter):
        # Restores without a target are safe here: saves are plain numpy
        # trees (see save_checkpoint) with a digest check below, so orbax's
        # "UNSAFE without target" warning is noise for this format.
        def filter(self, record: _logging.LogRecord) -> bool:
            return "target tree to be provided" not in record.getMessage()

    absl_logger = _logging.getLogger("absl")
    filt = _SilenceTargetWarning()
    absl_logger.addFilter(filt)
    try:
        with ocp.StandardCheckpointer() as ckptr:
            if example is not None:
                tree = ckptr.restore(path / "state", target=example)
            else:
                tree = ckptr.restore(path / "state")
    finally:
        absl_logger.removeFilter(filt)
    if strict_digest:
        got = params_digest(tree["params"])
        want = meta.get("params_sha256")
        if want and got != want:
            raise ValueError(f"checkpoint digest mismatch: {got} != {want}")
    return tree, meta


def export_retriever_features(params: Any, parity_meta: dict[str, int]) -> dict[str, Any]:
    """The typed retriever->GFlowNet feature-extractor bundle.

    Contains exactly the parameters needed to reproduce the retriever's edge
    geometry (the reference embedder reads these by state-dict key,
    ``gflownet_embedder.py:313-533``) plus the parity_meta contract.
    """
    inner = params["params"] if "params" in params else params
    missing = [k for k in RETRIEVER_FEATURE_KEYS if k not in inner]
    if missing:
        raise KeyError(f"retriever params missing feature keys: {missing}")
    bundle = {k: inner[k] for k in RETRIEVER_FEATURE_KEYS}
    return {"features": bundle, "parity_meta": dict(parity_meta)}


def validate_parity_meta(expected: dict[str, int], actual: dict[str, int]) -> None:
    """Hard-fail on any feature-geometry mismatch (reference
    ``gflownet_embedder.py:698-759`` parse/validate semantics)."""
    mismatches = {
        k: (expected.get(k), actual.get(k))
        for k in set(expected) | set(actual)
        if int(expected.get(k, -1)) != int(actual.get(k, -1))
    }
    if mismatches:
        raise ValueError(f"parity_meta mismatch (expected, actual): {mismatches}")
