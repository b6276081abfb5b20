"""Full 6-stage pipeline through the CLI on synthetic data.

The analog of the reference's ``scripts/run_full_pipeline.sh`` smoke path:
train_retriever -> eval_retriever (g_agent + topk artifacts) ->
train_gflownet -> eval_gflownet (rollout artifacts) -> bfs_chains ->
reasoner (oracle + mock LLM).
"""

import json
import pathlib

import pytest

from evi_rag_tpu import cli
from evi_rag_tpu.utils.config import load_config

pytestmark = pytest.mark.slow

CONFIGS = str(pathlib.Path(__file__).resolve().parents[1] / "configs")


def _run(task, overrides, tmp_path):
    cfg = load_config(CONFIGS, task, overrides)
    cfg["task_name"] = task
    cfg.setdefault("paths", {})["log_dir"] = str(tmp_path / "logs")
    run_dir = tmp_path / "runs" / task
    run_dir.mkdir(parents=True, exist_ok=True)
    return cli.TASKS[task](cfg, run_dir=run_dir), run_dir


def test_full_pipeline_synthetic(tmp_path):
    art = str(tmp_path / "artifacts")
    common = [
        "experiment=quick_synthetic",
        f"eval.artifacts_dir={art}",
        f"gflownet.g_agent_dir={art}/g_agent",
    ]

    # 1. train retriever
    m1, run1 = _run(
        "train_retriever",
        ["experiment=quick_synthetic", f"retriever.train.ckpt_dir={tmp_path}/ckpt/retriever"],
        tmp_path,
    )
    assert m1["epochs"] >= 1
    best = tmp_path / "ckpt" / "retriever" / "best"
    assert (best / "meta.json").exists()
    meta = json.loads((best / "meta.json").read_text())
    assert meta["parity_meta"]["dde_rounds"] == 2

    # 2. eval retriever -> g_agent + topk artifacts
    m2, _ = _run(
        "eval_retriever",
        common + [f"retriever.ckpt={best}", "eval.splits=[validation]",
                  "eval.g_agent.edge_top_k=50"],
        tmp_path,
    )
    assert m2["validation/num_agent_samples"] > 0
    ga_manifest = json.loads(
        (pathlib.Path(art) / "g_agent" / "validation" / "manifest.json").read_text()
    )
    # Full settings provenance: behavior-affecting knobs must be recorded.
    assert {"edge_top_k", "max_hops", "apply_hop_filter", "start_max_edges",
            "score_mode"} <= set(ga_manifest["settings"])
    assert (pathlib.Path(art) / "eval_retriever" / "validation.manifest.json").exists()
    # Top-k edge records carry the reference writer's per-edge schema
    # (retriever_topk_edge_writer.py:332-350).
    topk_line = json.loads(
        (pathlib.Path(art) / "eval_retriever" / "validation.jsonl")
        .read_text().splitlines()[0]
    )
    assert "triplets_by_k" in topk_line and "answer_entity_ids" in topk_line
    first_k = next(iter(topk_line["triplets_by_k"].values()))
    assert {"head_entity_id", "relation_id", "tail_entity_id", "score",
            "label", "rank", "logit_fwd", "logit_bwd"} <= set(first_k[0])
    assert first_k[0]["rank"] == 1
    assert 0.0 <= m2["validation/edge/recall@10"] <= 1.0

    # 2b. serve: index-and-query engine over the same split + ckpt
    m2b, run2b = _run(
        "serve",
        ["experiment=quick_synthetic", f"retriever.ckpt={best}",
         "serve.splits=[validation]", "serve.k=20", "serve.k_values=[1,10]"],
        tmp_path,
    )
    assert m2b["validation/num_questions"] > 0
    assert m2b["validation/queries_per_s"] > 0
    assert 0.0 <= m2b["validation/serve/recall@10"] <= 1.0
    serve_lines = [
        json.loads(l)
        for l in (run2b / "validation_serve.jsonl").read_text().splitlines()
    ]
    assert len(serve_lines) == m2b["validation/num_questions"]
    assert all(len(r["triples"]) == len(r["scores"]) for r in serve_lines)

    # Materialize a train-split g_agent too (needed by the GFlowNet).
    _run(
        "eval_retriever",
        common + [f"retriever.ckpt={best}", "eval.splits=[train]",
                  "eval.g_agent.edge_top_k=50"],
        tmp_path,
    )

    # 3. train gflownet (requires retriever ckpt; guard tested too)
    with pytest.raises(Exception, match="retriever.ckpt"):
        _run("train_gflownet", common + [f"gflownet.ckpt_dir={tmp_path}/ckpt/gfn"], tmp_path)
    m3, _ = _run(
        "train_gflownet",
        common + [f"retriever.ckpt={best}", f"gflownet.ckpt_dir={tmp_path}/ckpt/gfn"],
        tmp_path,
    )
    gfn_best = tmp_path / "ckpt" / "gfn" / "best"
    assert (gfn_best / "meta.json").exists()
    gmeta = json.loads((gfn_best / "meta.json").read_text())
    assert gmeta["retriever_meta"]["retriever_ckpt_sha256"] == meta["params_sha256"]

    # 4. eval gflownet -> rollout artifacts
    m4, _ = _run(
        "eval_gflownet",
        common + [f"gflownet.ckpt={gfn_best}", "eval.splits=[validation]"],
        tmp_path,
    )
    assert "validation/answer_hit@1" in m4
    rollouts = pathlib.Path(art) / "eval_gflownet" / "validation.jsonl"
    assert rollouts.exists()
    rec = json.loads(rollouts.read_text().strip().split("\n")[0])
    assert "candidate_chains" in rec and rec["num_rollouts"] >= 1

    # 5. bfs chain baseline
    m5, _ = _run("bfs_chains", common + ["eval.splits=[validation]"], tmp_path)
    assert m5["validation/num_samples"] > 0

    # 6. reasoner: oracle + mock LLM
    m6, _ = _run("reasoner", common + ["eval.splits=[validation]"], tmp_path)
    assert "validation/answer_hit@10" in m6
    m7, _ = _run(
        "reasoner",
        common + ["eval.splits=[validation]", "reasoner=mock"],
        tmp_path,
    )
    assert m7["validation/results/total"] > 0
    preds = pathlib.Path(art) / "reasoner" / "validation.jsonl"
    assert preds.exists()


def test_eval_dataset_variants_loop(tmp_path):
    """eval.datasets loops dataset groups (the reference's full+sub dual eval)."""
    # Train a tiny ckpt first.
    _, _ = _run(
        "train_retriever",
        ["experiment=quick_synthetic", f"retriever.train.ckpt_dir={tmp_path}/ckpt"],
        tmp_path,
    )
    best = tmp_path / "ckpt" / "best"
    cfg = load_config(
        CONFIGS, "eval_retriever",
        ["experiment=quick_synthetic", f"retriever.ckpt={best}",
         "eval.splits=[validation]", "eval.g_agent.edge_top_k=20",
         "eval.datasets=[synthetic, synthetic]",
         f"eval.artifacts_dir={tmp_path}/art"],
    )
    cfg["task_name"] = "eval_retriever"
    cfg["_configs_dir"] = CONFIGS
    run_dir = tmp_path / "runs" / "dual"
    run_dir.mkdir(parents=True)
    m = cli.TASKS["eval_retriever"](cfg, run_dir=run_dir)
    assert any(k.startswith("synthetic/validation/") for k in m)
    assert (run_dir / "metrics.json").exists()
