"""CLI-level serve surface: plain vs data-parallel mesh, identical results.

Covers the ``serve`` task at the exact user surface (``cli.TASKS``) on both
lanes: the default CPU lane sees 8 virtual devices (an 8-way serve mesh);
the hardware lane (``EVI_TESTS_ON_TPU=1``, via ``make test-tpu``) sees the
single real chip (a 1-device mesh) — so the mesh code path itself is
exercised on real hardware, not only in the multichip dryrun.

Reference capability: single-process eval/serving (``src/eval.py:32-77``)
+ DDP-style data distribution (``configs/trainer/ddp.yaml``).
"""

import json
import pathlib

import pytest

from evi_rag_tpu import cli
from evi_rag_tpu.utils.config import load_config

pytestmark = pytest.mark.slow

CONFIGS = str(pathlib.Path(__file__).resolve().parents[1] / "configs")


def _run(task, overrides, tmp_path, tag):
    cfg = load_config(CONFIGS, task, overrides)
    cfg["task_name"] = task
    cfg.setdefault("paths", {})["log_dir"] = str(tmp_path / "logs")
    run_dir = tmp_path / "runs" / tag
    run_dir.mkdir(parents=True, exist_ok=True)
    return cli.TASKS[task](cfg, run_dir=run_dir), run_dir


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_cli")
    _run(
        "train_retriever",
        ["experiment=quick_synthetic", f"retriever.train.ckpt_dir={tmp}/ckpt"],
        tmp, "train",
    )
    return tmp / "ckpt" / "best", tmp


def test_serve_cli_plain_vs_data_parallel(trained_ckpt):
    ckpt, tmp = trained_ckpt
    common = [
        "experiment=quick_synthetic",
        f"retriever.ckpt={ckpt}",
        "serve.splits=[validation]",
        "serve.k=20",
        "serve.k_values=[1, 10]",
    ]
    m_plain, run_plain = _run("serve", common, tmp, "serve_plain")
    m_dp, run_dp = _run(
        "serve", common + ["serve.data_parallel=true"], tmp, "serve_dp"
    )

    assert m_plain["validation/num_questions"] > 0
    for key in ("validation/serve/recall@1", "validation/serve/recall@10"):
        assert m_dp[key] == pytest.approx(m_plain[key], abs=1e-6), key

    # The ranked triples themselves must agree question-for-question.
    def _rows(run_dir):
        lines = (run_dir / "validation_serve.jsonl").read_text().splitlines()
        return {r["sample_id"]: r for r in map(json.loads, lines)}

    rows_p, rows_d = _rows(run_plain), _rows(run_dp)
    assert rows_p.keys() == rows_d.keys()
    mismatched = sum(
        rows_p[i]["triples"] != rows_d[i]["triples"] for i in rows_p
    )
    # bf16 score ties may reorder within a tie class across dispatch shapes;
    # require the overwhelming majority of rankings to be identical.
    assert mismatched <= max(1, len(rows_p) // 20), (
        f"{mismatched}/{len(rows_p)} questions ranked differently under DP"
    )


def test_serve_cli_reports_phase_breakdown(trained_ckpt):
    ckpt, tmp = trained_ckpt
    m, _ = _run(
        "serve",
        ["experiment=quick_synthetic", f"retriever.ckpt={ckpt}",
         "serve.splits=[validation]", "serve.k=20", "serve.write_jsonl=false"],
        tmp, "serve_phases",
    )
    for phase in ("pack_s", "dispatch_s", "drain_s", "index_build_s", "scoring_s"):
        assert m[f"validation/{phase}"] >= 0.0
    assert m["validation/queries_per_s"] > 0
