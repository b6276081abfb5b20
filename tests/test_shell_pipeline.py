"""scripts/run_full_pipeline.sh end-to-end on a toy real-format dataset.

The shell driver is the user-facing 6-step orchestration; this exercises it
exactly as shipped (build -> train -> dual eval -> gflownet -> rollouts ->
oracle) against generated raw parquet, in an isolated working directory.
"""

import json
import os
import pathlib
import shutil
import subprocess

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow

REPO = pathlib.Path(__file__).resolve().parents[1]


def _gen_raw(out_dir: pathlib.Path, split: str, n: int, seed: int):
    rng = np.random.default_rng(seed)
    relations = [f"rel_{i}" for i in range(6)]
    rows = []
    for i in range(n):
        n_extra = int(rng.integers(3, 8))
        path_len = int(rng.integers(1, 3))
        ents = [f"{split}_e{i}_{j}" for j in range(path_len + 1 + n_extra)]
        graph = [
            [ents[j], relations[int(rng.integers(6))], ents[j + 1]]
            for j in range(path_len)
        ]
        for _ in range(n_extra):
            a, b = rng.integers(0, len(ents), size=2)
            if a != b:
                graph.append([ents[a], relations[int(rng.integers(6))], ents[b]])
        rows.append(
            {
                "id": f"{split}-{i}",
                "question": f"which entity follows {ents[0]}?",
                "q_entity": [ents[0]],
                "a_entity": [ents[path_len]],
                "graph": graph,
            }
        )
    pq.write_table(pa.Table.from_pylist(rows), out_dir / f"{split}-00000.parquet")


def test_run_full_pipeline_script(tmp_path):
    work = tmp_path / "work"
    (work / "data" / "raw" / "toy").mkdir(parents=True)
    shutil.copytree(REPO / "configs", work / "configs")
    shutil.copy(REPO / "scripts" / "run_full_pipeline.sh", work / "run.sh")
    for split, n, seed in (("train", 12, 0), ("validation", 6, 1), ("test", 6, 2)):
        _gen_raw(work / "data" / "raw" / "toy", split, n, seed)

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    # Small-but-real settings via env-driven overrides in the script call:
    # patch the script invocation for tiny models by appending overrides.
    script = (work / "run.sh").read_text()
    script = script.replace(
        '$CLI train_retriever dataset="$DATASET-sub" \\\n  retriever.train.ckpt_dir="$ART/ckpt/retriever"',
        '$CLI train_retriever dataset="$DATASET-sub" \\\n  retriever.train.ckpt_dir="$ART/ckpt/retriever" '
        "retriever.model.emb_dim=auto retriever.model.hidden_dim=auto "
        "retriever.train.max_epochs=1 build.encoder.dim=32",
    )
    script = script.replace(
        'build.out_dir="data/normalized/$DATASET"',
        'build.out_dir="data/normalized/$DATASET" build.encoder.dim=32 build.text_policy.mode=all',
    )
    script = script.replace(
        'retriever.ckpt="$RETRIEVER_CKPT" \\\n    "eval.splits=[train, validation, test]"',
        'retriever.ckpt="$RETRIEVER_CKPT" retriever.model.emb_dim=auto retriever.model.hidden_dim=auto '
        '\\\n    "eval.splits=[train, validation, test]" eval.g_agent.edge_top_k=30',
    )
    script = script.replace(
        'gflownet.ckpt_dir="$ART/ckpt/gflownet"',
        'gflownet.ckpt_dir="$ART/ckpt/gflownet" gflownet.hidden_dim=auto '
        "gflownet.max_epochs=1 gflownet.num_train_rollouts=2 "
        "retriever.model.emb_dim=auto retriever.model.hidden_dim=auto",
    )
    script = script.replace(
        'gflownet.g_agent_dir="$ART/$DATASET-sub/g_agent" \\\n  eval.artifacts_dir="$ART/$DATASET-sub"',
        'gflownet.g_agent_dir="$ART/$DATASET-sub/g_agent" gflownet.hidden_dim=auto '
        'gflownet.eval_rollouts=4 "gflownet.eval_rollout_prefixes=[1, 4]" '
        '"eval.splits=[validation]" \\\n  eval.artifacts_dir="$ART/$DATASET-sub"',
    )
    (work / "run.sh").write_text(script)

    proc = subprocess.run(
        ["bash", "run.sh", "toy"], cwd=work, env=env,
        capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}"
    assert "pipeline complete" in proc.stdout

    art = work / "artifacts" / "toy"
    assert (art / "ckpt" / "retriever" / "best" / "meta.json").exists()
    assert (art / "ckpt" / "gflownet" / "best" / "meta.json").exists()
    assert (art / "toy-sub" / "g_agent" / "train" / "manifest.json").exists()
    assert (art / "toy-sub" / "eval_gflownet" / "validation.jsonl").exists()
    # Oracle metrics landed in the last run dir.
    metrics_files = sorted((work / "logs").rglob("metrics.json"))
    assert metrics_files, "no metrics.json produced"
    last = json.loads(metrics_files[-1].read_text())
    assert last, "empty metrics"


def test_mask_ablation_script_single_point(tmp_path):
    """The shipped ablation driver runs the hide-and-seek grid as-is; a
    1x1 env-driven grid on synthetic data is the smoke path."""
    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu",
        ABLATION_P_NEAR="0.3", ABLATION_BIAS_NEAR="-2.0",
    )
    work = tmp_path / "work"
    work.mkdir()
    shutil.copytree(REPO / "configs", work / "configs")
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_retriever_mask_ablation.sh"),
         "synthetic", "experiment=quick_synthetic", "extras.print_config=false",
         f"paths.log_dir={work}/logs", f"retriever.train.ckpt_dir={work}/ckpt"],
        cwd=work, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    assert "ablation p_near=0.3 bias_near=-2.0" in proc.stdout
    assert (work / "ckpt" / "best" / "meta.json").exists()
