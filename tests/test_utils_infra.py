"""Infra utils: MetricLogger jsonl, scalar coercion, Registry, task_wrapper,
run-name resolution, profiling annotate (the reference's utils/ layer —
``logging_utils.py``, ``registry.py``, ``run_context.py``, ``utils.py``)."""

import json
import logging

import numpy as np
import pytest

from evi_rag_tpu.utils.logging import MetricLogger, get_logger, save_metrics_json
from evi_rag_tpu.utils.profiling import annotate
from evi_rag_tpu.utils.registry import Registry
from evi_rag_tpu.utils.run_context import make_run_dir, resolve_run_name, task_wrapper


def test_metric_logger_jsonl_and_scalars(tmp_path):
    ml = MetricLogger(tmp_path)
    ml.log({"loss": np.float32(1.5), "arr": np.array(2.0), "name": "x"}, step=3)
    ml.log({"loss": 1.0}, step=4)
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["_step"] == 3
    assert lines[0]["loss"] == pytest.approx(1.5)
    assert lines[0]["arr"] == pytest.approx(2.0)  # 0-d arrays coerce to float
    assert lines[0]["name"] == "x"


def test_save_metrics_json_roundtrip(tmp_path):
    save_metrics_json(tmp_path / "m.json", {"a": np.float64(0.25), "b": 2})
    got = json.loads((tmp_path / "m.json").read_text())
    assert got == {"a": 0.25, "b": 2}


def test_registry_register_get_and_errors():
    reg = Registry("thing")
    @reg.register("foo")
    def foo():
        return 1
    assert reg.get("foo") is foo
    assert reg.names() == ["foo"]
    with pytest.raises(KeyError):
        reg.get("bar")
    with pytest.raises(KeyError):
        reg.register("foo")(lambda: 2)  # duplicate names rejected


def test_task_wrapper_logs_and_reraises(tmp_path, caplog):
    @task_wrapper
    def boom(cfg, *, run_dir):
        raise RuntimeError("kaput")

    with caplog.at_level(logging.ERROR):
        with pytest.raises(RuntimeError, match="kaput"):
            boom({"task_name": "t"}, run_dir=tmp_path)
    assert any("kaput" in r.getMessage() or "t" in r.getMessage() for r in caplog.records)


def test_resolve_run_name_and_run_dir(tmp_path):
    cfg = {"task_name": "train_retriever", "dataset": {"name": "webqsp"}}
    name = resolve_run_name(cfg)
    assert "train_retriever" in name and "webqsp" in name
    cfg["paths"] = {"log_dir": str(tmp_path)}
    d = make_run_dir(cfg)
    assert d.is_dir() and str(tmp_path) in str(d)


def test_annotate_context_is_transparent():
    with annotate("phase"):
        x = 1 + 1
    assert x == 2


def test_get_logger_has_rank_prefix():
    log = get_logger("evi_test_rank")
    log.info("hello")
    # rank prefix filter is installed on the logger (rank0 single-process).
    assert any(type(f).__name__ == "_ProcessPrefixFilter" for f in log.filters)
