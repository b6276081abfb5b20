"""Process-aware logging + metric sinks.

Replaces the reference's ``RankedLogger`` (``src/utils/pylogger.py:7-52``,
rank-prefixed stdlib logging) and the wandb/metric plumbing
(``src/utils/logging_utils.py:90-165``) with JAX-native equivalents:

* ``get_logger`` prefixes records with ``jax.process_index()``;
* ``rank_zero_only``-style gating via ``is_main_process``;
* ``MetricLogger`` appends metric rows to a JSONL file per run (offline-
  first; a wandb sink attaches automatically when the package exists).
"""

from __future__ import annotations

import json
import logging
import pathlib
import time
from typing import Any, Mapping


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class _ProcessPrefixFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        try:
            import jax

            record.rank = jax.process_index()
        except Exception:
            record.rank = 0
        return True


def get_logger(name: str, *, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not any(isinstance(f, _ProcessPrefixFilter) for f in logger.filters):
        logger.addFilter(_ProcessPrefixFilter())
    if not logger.handlers and not logging.getLogger().handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(asctime)s][rank%(rank)s][%(name)s][%(levelname)s] %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger


class MetricLogger:
    """JSONL metric sink (one row per log call), main-process only."""

    def __init__(self, run_dir: str | pathlib.Path, *, filename: str = "metrics.jsonl") -> None:
        self.run_dir = pathlib.Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.run_dir / filename
        self._wandb = None

    def log(self, metrics: Mapping[str, Any], *, step: int | None = None) -> None:
        if not is_main_process():
            return
        row = {"_time": time.time(), "_step": step, **{k: _scalar(v) for k, v in metrics.items()}}
        with self.path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def attach_wandb(self, *, project: str, name: str, config: dict | None = None) -> None:
        try:
            import wandb

            self._wandb = wandb.init(project=project, name=name, config=config)
        except ImportError:
            pass


def _scalar(v: Any) -> Any:
    try:
        import numpy as np

        if isinstance(v, (np.floating, np.integer)):
            return v.item()
        arr = np.asarray(v)
        if arr.ndim == 0:
            return arr.item()
    except Exception:
        pass
    return v


def save_metrics_json(path: str | pathlib.Path, metrics: Mapping[str, Any]) -> None:
    """Persist a metrics dict (the reference's per-eval ``metrics.json``,
    ``src/eval.py:114-129``)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps({k: _scalar(v) for k, v in metrics.items()}, indent=2, sort_keys=True))
