"""Hyperparameter sweep driver: sampling, grid, failure tolerance."""

import numpy as np
import pytest

from evi_rag_tpu.train.sweep import grid_points, run_sweep, sample_space


def test_sample_space_distributions():
    rng = np.random.default_rng(0)
    space = {
        "a.lr": {"dist": "loguniform", "low": 1e-5, "high": 1e-1},
        "b.dim": {"dist": "choice", "values": [16, 32]},
        "c.t": {"dist": "uniform", "low": 0.5, "high": 2.0},
        "d.n": {"dist": "int_uniform", "low": 1, "high": 4},
    }
    for _ in range(20):
        s = sample_space(space, rng)
        assert 1e-5 <= s["a.lr"] <= 1e-1
        assert s["b.dim"] in (16, 32)
        assert 0.5 <= s["c.t"] <= 2.0
        assert s["d.n"] in (1, 2, 3, 4)


def test_grid_points():
    pts = grid_points({
        "x": {"dist": "choice", "values": [1, 2]},
        "y": {"dist": "choice", "values": ["a", "b", "c"]},
    })
    assert len(pts) == 6
    with pytest.raises(ValueError, match="choice"):
        grid_points({"x": {"dist": "uniform", "low": 0, "high": 1}})


def test_run_sweep_picks_best_and_survives_failures(tmp_path):
    base = {"model": {"lr": 0.0}}
    space = {"model.lr": {"dist": "choice", "values": [0.1, 0.2, 0.3, 0.4]}}

    def objective(cfg):
        lr = cfg["model"]["lr"]
        if lr == 0.3:
            raise RuntimeError("boom")
        return {"score": -abs(lr - 0.2)}  # best at 0.2

    res = run_sweep(
        base, space, objective, monitor="score", mode="max",
        strategy="grid", out_path=tmp_path / "sweep.json",
    )
    assert res["best"]["overrides"]["model.lr"] == 0.2
    statuses = [t["status"] for t in res["trials"]]
    assert statuses.count("error") == 1 and statuses.count("ok") == 3
    assert (tmp_path / "sweep.json").exists()


def test_tpe_converges_on_quadratic():
    """TPE beats random on a smooth objective: after the startup phase,
    suggestions concentrate near the optimum."""
    from evi_rag_tpu.train.sweep import run_sweep

    space = {
        "a.x": {"dist": "uniform", "low": -2.0, "high": 2.0},
        "a.lr": {"dist": "loguniform", "low": 1e-5, "high": 1e-1},
        "a.c": {"dist": "choice", "values": ["good", "bad"]},
    }

    def objective(cfg):
        x = cfg["a"]["x"]
        lr = cfg["a"]["lr"]
        bonus = 1.0 if cfg["a"]["c"] == "good" else 0.0
        return {"score": -(x - 0.5) ** 2 - (np.log10(lr) + 3) ** 2 * 0.1 + bonus}

    res = run_sweep(
        {}, space, objective, monitor="score", mode="max",
        strategy="tpe", num_trials=40, seed=0,
    )
    assert res["best"]["status"] == "ok"
    # Late TPE trials should be better than the random startup on average.
    scores = [t["score"] for t in res["trials"] if t["status"] == "ok"]
    assert np.mean(scores[-10:]) > np.mean(scores[:5])
    assert res["best"]["score"] > 0.8  # found the 'good' branch near x=0.5
    assert res["best"]["overrides"]["a.c"] == "good"


def test_tpe_int_uniform_and_failure_tolerance():
    from evi_rag_tpu.train.sweep import run_sweep

    space = {"b.n": {"dist": "int_uniform", "low": 1, "high": 16}}
    calls = []

    def objective(cfg):
        n = cfg["b"]["n"]
        calls.append(n)
        if len(calls) == 3:
            raise RuntimeError("boom")  # failure-tolerant
        assert isinstance(n, int)
        return {"score": -abs(n - 10)}

    res = run_sweep(
        {}, space, objective, monitor="score", mode="max",
        strategy="tpe", num_trials=15, seed=1,
    )
    assert sum(t["status"] == "error" for t in res["trials"]) == 1
    assert res["best"]["overrides"]["b.n"] in range(1, 17)


def test_task_sweep_dispatch(tmp_path):
    """sweep.task selects the training objective (reference sweeps both
    retriever and GFlowNet, hparams_search/*.yaml); invalid tasks fail
    loudly, and the gflownet objective inherits its ckpt guard."""
    import pytest as _pytest

    from evi_rag_tpu import cli
    from evi_rag_tpu.utils.config import ConfigError

    base = {
        "dataset": {"source": "synthetic", "num_samples": 4, "emb_dim": 8, "max_nodes": 6},
        "sweep": {
            "task": "nope",
            "space": {"retriever.train.optimizer.learning_rate":
                      {"dist": "choice", "values": [1e-3]}},
            "num_trials": 1,
        },
    }
    with _pytest.raises(ConfigError, match="sweep.task"):
        cli.task_sweep.__wrapped__(base, run_dir=tmp_path / "a")

    # gflownet dispatch reaches train_gflownet's own retriever.ckpt guard,
    # which the failure-tolerant sweep records as an errored trial.
    base["sweep"]["task"] = "train_gflownet"
    base["sweep"]["monitor"] = "best_score"
    res = cli.task_sweep.__wrapped__(base, run_dir=tmp_path / "b")
    assert res["num_trials"] == 1 and res["best_score"] is None
