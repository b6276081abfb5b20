"""Hyperparameter search driver (the reference's Optuna sweeps,
``configs/hparams_search/*.yaml``, without the optuna dependency).

A sweep spec maps dotted config keys to search spaces::

    space:
      retriever.train.optimizer.learning_rate: {dist: loguniform, low: 1e-5, high: 1e-2}
      retriever.model.hidden_dim: {dist: choice, values: [256, 512, 1024]}
      retriever.train.loss.infonce_temperature: {dist: uniform, low: 0.3, high: 2.0}

Strategies: ``random`` (seeded) and ``grid`` (cartesian over choice spaces).
Like the reference's sweeps, runs are independent and failure-tolerant: a
crashed trial records its error and the sweep continues
(``README.md:350`` "not failure-resistant" is the part we improve on).
"""

from __future__ import annotations

import itertools
import json
import pathlib
import traceback
from typing import Any, Callable

import numpy as np

from evi_rag_tpu.utils.config import deep_merge, set_dotted
from evi_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)


def sample_space(space: dict[str, dict], rng: np.random.Generator) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for key, spec in space.items():
        dist = spec.get("dist", "choice")
        if dist == "choice":
            out[key] = spec["values"][int(rng.integers(len(spec["values"])))]
        elif dist == "uniform":
            out[key] = float(rng.uniform(spec["low"], spec["high"]))
        elif dist == "loguniform":
            out[key] = float(np.exp(rng.uniform(np.log(spec["low"]), np.log(spec["high"]))))
        elif dist == "int_uniform":
            out[key] = int(rng.integers(spec["low"], spec["high"] + 1))
        else:
            raise ValueError(f"unknown dist {dist!r} for {key}")
    return out


def grid_points(space: dict[str, dict]) -> list[dict[str, Any]]:
    keys = sorted(space)
    values = []
    for k in keys:
        spec = space[k]
        if spec.get("dist", "choice") != "choice":
            raise ValueError(f"grid search requires choice spaces; {k} is {spec.get('dist')}")
        values.append(spec["values"])
    return [dict(zip(keys, combo)) for combo in itertools.product(*values)]


def run_sweep(
    base_cfg: dict,
    space: dict[str, dict],
    objective: Callable[[dict], dict[str, float]],
    *,
    monitor: str,
    mode: str = "max",
    strategy: str = "random",
    num_trials: int = 10,
    seed: int = 0,
    out_path: str | pathlib.Path | None = None,
) -> dict[str, Any]:
    """Run trials; returns {best, trials}.  ``objective(cfg) -> metrics``."""
    rng = np.random.default_rng(seed)
    if strategy == "grid":
        points = grid_points(space)
    elif strategy == "random":
        points = [sample_space(space, rng) for _ in range(num_trials)]
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    sign = 1.0 if mode == "max" else -1.0
    trials: list[dict[str, Any]] = []
    best: dict[str, Any] | None = None
    for i, overrides in enumerate(points):
        cfg = deep_merge(base_cfg, {})
        for key, value in overrides.items():
            set_dotted(cfg, key, value)
        record: dict[str, Any] = {"trial": i, "overrides": overrides}
        try:
            metrics = objective(cfg)
            score = float(metrics.get(monitor, float("-inf") * sign))
            record.update(status="ok", score=score, metrics=metrics)
            if best is None or sign * score > sign * best["score"]:
                best = record
        except Exception as exc:  # failure-tolerant sweep
            record.update(status="error", error=str(exc), traceback=traceback.format_exc())
            log.warning("trial %d failed: %s", i, exc)
        trials.append(record)
        if out_path is not None:
            pathlib.Path(out_path).write_text(
                json.dumps({"best": best, "trials": trials}, indent=2, default=str)
            )
    return {"best": best, "trials": trials}
