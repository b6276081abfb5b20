"""The real-data parity runbook must dry-run against the fixture (VERDICT
r4 #7): real WebQSP parquet and gte-large weights are blocked on egress, so
`scripts/run_real_parity.sh` is the one command that executes the reference
recall-parity protocol the moment they land -- and this test proves the
command's stages actually run by driving its ``--dryrun`` mode against the
schema-verbatim RoG fixture (hash encoder, tiny budgets, same stage graph:
build -> train(sub) -> eval(full+sub) -> recall table)."""

from __future__ import annotations

import os
import pathlib
import subprocess

import pytest

pytestmark = pytest.mark.slow

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_runbook_dryruns_against_fixture(tmp_path):
    from tests.test_raw_ingestion import _make_webqsp_raw

    raw = _make_webqsp_raw(tmp_path)
    scratch = tmp_path / "scratch"
    # The dry-run is hardware-independent; pin the subprocesses to CPU so
    # the test never contends with (or waits on) the real chip.
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        ["bash", "scripts/run_real_parity.sh", "--dryrun", str(raw), str(scratch)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    out = proc.stdout
    # Every stage announced itself and the final table printed recall rows.
    for marker in ("== 1/4 build", "== 2/4 train_retriever",
                   "== 3/4 eval_retriever", "== 4/4 recall table",
                   "recall@10", "parity runbook complete"):
        assert marker in out, (marker, out[-3000:])
    # The artifacts the real run would produce exist.
    assert (scratch / "normalized" / "questions.parquet").exists()
    assert (scratch / "artifacts" / "ckpt" / "retriever" / "best").exists()


def test_runbook_requires_real_artifacts_without_dryrun():
    """Without the blocked artifacts the real mode must fail fast with a
    clear message, not half-run."""
    proc = subprocess.run(
        ["bash", "scripts/run_real_parity.sh", "/nonexistent/raw", "/nonexistent/gte"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 2
    assert "raw parquet not found" in proc.stderr
