"""seed_stats task: one-hop per-seed diagnostics
(reference ``scripts/seed_onehop_stats.py``)."""

import pathlib

import numpy as np

from evi_rag_tpu import cli
from evi_rag_tpu.utils.config import load_config

CONFIGS = str(pathlib.Path(__file__).resolve().parents[1] / "configs")


def test_seed_stats_matches_direct_computation(tmp_path):
    cfg = load_config(CONFIGS, "train_retriever", ["experiment=quick_synthetic"])
    cfg["task_name"] = "seed_stats"
    cfg.setdefault("eval", {})["splits"] = ["validation"]
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    out = cli.task_seed_stats.__wrapped__(cfg, run_dir=run_dir)

    # Independent recomputation straight from the split.
    samples, *_ = cli._load_split(cfg, "validation")
    counts, ratios = [], []
    for s in samples:
        labels = np.asarray(s.edge_labels, np.float32)
        for seed in np.asarray(s.topic_locals):
            inc = (s.edge_index[0] == seed) | (s.edge_index[1] == seed)
            counts.append(int(inc.sum()))
            ratios.append(float(labels[inc].mean()) if inc.any() else 0.0)
    assert counts, "synthetic split must yield seeds"
    np.testing.assert_allclose(
        out["validation/onehop_edges/mean"], np.mean(counts), rtol=1e-9
    )
    np.testing.assert_allclose(
        out["validation/onehop_edges/p90"], np.percentile(counts, 90), rtol=1e-9
    )
    np.testing.assert_allclose(
        out["validation/onehop_pos_ratio/mean"], np.mean(ratios), rtol=1e-6
    )
    assert (run_dir / "metrics.json").exists()
