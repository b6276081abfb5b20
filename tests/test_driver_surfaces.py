"""Driver-surface robustness: bench.py and dryrun_multichip must survive a
dead/hung remote-TPU tunnel (VERDICT r3 weak #1 / next-step #1).

Round 3 shipped rc=1 (bench: backend init raised on the first device op) and
rc=124 (dryrun: the parent's ``jax.devices()`` probe hung) the moment the
tunnel blinked.  These tests fake backend failure and assert the contracted
behaviors: bench exits 0 with a structured one-line JSON error; dryrun never
touches the real backend at all.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sanitized_env(**overrides) -> dict:
    """Env without the container's .axon_site sitecustomize (which would make
    a broken backend HANG instead of fail fast) and without the conftest's
    platform forcing."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("EVI_TESTS_ON_TPU", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.update(overrides)
    return env


def test_bench_backend_unavailable_is_structured_exit0(tmp_path):
    """A persistently-failing backend must yield rc=0 + parseable error JSON,
    never a bare traceback (the r3 BENCH rc=1 failure mode)."""
    env = _sanitized_env(
        JAX_PLATFORMS="tpu",  # no libtpu in this container -> init fails fast
        EVI_BENCH_PROBE_ATTEMPTS="2",
        EVI_BENCH_PROBE_TIMEOUT_S="60",
        EVI_BENCH_PROBE_BACKOFF_S="0",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=tmp_path, capture_output=True, text=True, timeout=180,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    line = p.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["error"] == "backend_unavailable"
    assert out["value"] is None
    assert out["metric"] == "query_throughput_131k_candidates_top100_d1024"
    assert out["unit"] == "queries/sec/chip"
    # The details artifact is still written, with the error recorded.
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["error"] == "backend_unavailable"


def test_bench_exception_is_structured_exit0(tmp_path, monkeypatch, capsys):
    """An unexpected mid-run exception must also resolve to rc=0 + structured
    JSON, committing whatever sections already completed."""
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(bench, "wait_for_backend", lambda: (True, "fake"))

    def boom():
        bench.DETAILS["partial_section"] = 42
        raise RuntimeError("mid-run tunnel drop")

    monkeypatch.setattr(bench, "main", boom)
    bench.DETAILS.clear()
    rc = bench.run_cli()
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["error"] == "bench_exception"
    assert "mid-run tunnel drop" in out["detail"]
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["partial_section"] == 42  # partial progress preserved
    assert details["error"] == "bench_exception"
    bench.DETAILS.clear()


def test_probe_detects_fast_failure():
    sys.path.insert(0, REPO)
    import bench

    env_backup = dict(os.environ)
    try:
        os.environ["JAX_PLATFORMS"] = "tpu"
        os.environ["PYTHONPATH"] = REPO  # drop .axon_site: fail, don't hang
        ok, info = bench.probe_backend(timeout_s=60)
    finally:
        os.environ.clear()
        os.environ.update(env_backup)
    assert not ok
    assert info  # carries the underlying init error text


def test_dryrun_child_env_is_tunnel_immune():
    """The dryrun child env must be unable to reach the real backend: cpu
    platform, .axon_site stripped, forced virtual device count."""
    import __graft_entry__ as ge

    env = ge._child_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_EVI_DRYRUN_CHILD"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    for p in env["PYTHONPATH"].split(os.pathsep):
        assert "axon" not in os.path.basename(os.path.normpath(p))
    assert REPO in env["PYTHONPATH"].split(os.pathsep)


def test_dryrun_child_env_replaces_stale_device_count(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=3 --xla_foo=1")
    monkeypatch.setenv("PYTHONPATH", os.pathsep.join(["/root/.axon_site", REPO]))
    import __graft_entry__ as ge

    env = ge._child_env(4)
    assert env["XLA_FLAGS"].count("--xla_force_host_platform_device_count") == 1
    assert "--xla_force_host_platform_device_count=4" in env["XLA_FLAGS"]
    assert "--xla_foo=1" in env["XLA_FLAGS"]
    assert "/root/.axon_site" not in env["PYTHONPATH"].split(os.pathsep)


@pytest.mark.slow
def test_dryrun_never_inits_real_backend(tmp_path):
    """End-to-end: run the dryrun with a POISONED parent platform -- any
    parent-side backend touch would raise immediately; the sanitized child
    must still bring up the virtual CPU mesh and pass its mandatory stages."""
    # Budget 0 skips the optional stages (4-5): the property under test is
    # backend isolation + the mandatory stages, not full-stage coverage
    # (the multichip lane covers that); keeps the suite inside its budget.
    env = _sanitized_env(
        JAX_PLATFORMS="this_platform_does_not_exist", EVI_DRYRUN_BUDGET_S="0"
    )
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "dryrun", "2"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert p.returncode == 0, (p.stdout + p.stderr)[-3000:]
    assert "dp train loss=" in p.stdout
    assert "gflownet dp train loss=" in p.stdout
