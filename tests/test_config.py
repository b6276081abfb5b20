"""Config system: defaults, group swaps, experiment overlays, overrides, env."""

import pathlib

import pytest

from evi_rag_tpu.utils.config import (
    ConfigError,
    deep_merge,
    get_dotted,
    load_config,
    set_dotted,
)

CONFIGS = str(pathlib.Path(__file__).resolve().parents[1] / "configs")


def test_deep_merge_and_dotted():
    base = {"a": {"b": 1, "c": [1, 2]}, "d": 4}
    out = deep_merge(base, {"a": {"b": 9, "e": 5}, "f": 6})
    assert out == {"a": {"b": 9, "c": [1, 2], "e": 5}, "d": 4, "f": 6}
    assert base["a"]["b"] == 1  # no mutation
    cfg = {}
    set_dotted(cfg, "x.y.z", 3)
    assert get_dotted(cfg, "x.y.z") == 3
    assert get_dotted(cfg, "x.missing", "dflt") == "dflt"


def test_load_defaults_groups():
    cfg = load_config(CONFIGS, "train_retriever")
    assert cfg["dataset"]["source"] == "synthetic"
    assert cfg["retriever"]["model"]["emb_dim"] == 64
    assert cfg["task_name"] == "train_retriever"


def test_group_swap_and_value_overrides():
    cfg = load_config(
        CONFIGS, "train_retriever",
        ["dataset=webqsp-sub", "retriever.train.max_epochs=2", "retriever.model.hidden_dim=128"],
    )
    assert cfg["dataset"]["name"] == "webqsp-sub"
    assert cfg["dataset"]["filter"] == "sub_filter.json"
    assert cfg["retriever"]["train"]["max_epochs"] == 2
    assert cfg["retriever"]["model"]["hidden_dim"] == 128
    # YAML-typed override values
    cfg2 = load_config(CONFIGS, "train_retriever", ["retriever.train.k_values=[1,5]"])
    assert cfg2["retriever"]["train"]["k_values"] == [1, 5]


def test_experiment_overlay():
    cfg = load_config(CONFIGS, "train_retriever", ["experiment=quick_synthetic"])
    assert cfg["experiment_name"] == "quick_synthetic"
    assert cfg["dataset"]["num_samples"] == 16
    assert cfg["retriever"]["train"]["monitor"] == "edge/recall@5"
    # Untouched keys survive the overlay.
    assert cfg["retriever"]["model"]["emb_dim"] == 64


def test_env_interpolation(monkeypatch):
    cfg = load_config(CONFIGS, "eval_retriever")
    assert cfg["retriever"]["ckpt"] is None
    monkeypatch.setenv("RETRIEVER_CKPT", "/tmp/ck")
    cfg = load_config(CONFIGS, "eval_retriever")
    assert cfg["retriever"]["ckpt"] == "/tmp/ck"


def test_errors():
    with pytest.raises(ConfigError, match="not found"):
        load_config(CONFIGS, "no_such_config")
    with pytest.raises(ConfigError, match="key=value"):
        load_config(CONFIGS, "train_retriever", ["badoverride"])
