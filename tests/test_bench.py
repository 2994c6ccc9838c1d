"""Tests for the bench harness machinery (not the device benchmarks).

The watchdog exists because a hung device RPC (tunnel outage) blocks the
main thread inside C code where no signal can reach it — the bench must
still emit its one-line JSON with whatever was collected.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_sanitize_replaces_nonfinite():
    out = bench._sanitize({"a": float("nan"), "b": [1.0, float("inf")], "c": "x"})
    assert out == {"a": None, "b": [1.0, None], "c": "x"}


def test_emit_headline_from_partial_results(capsys):
    bench._emit(
        {
            "config1_monoexp_noisy": {
                "voxels_per_sec": 1e9,
                "scipy_baseline_voxels_per_sec": 5e3,
            }
        },
        aborted_stage="config2_qdess_e2e",
    )
    line = capsys.readouterr().out.strip()
    parsed = json.loads(line)
    assert parsed["value"] == 1e9
    assert parsed["vs_baseline"] == 200000.0
    assert "config2_qdess_e2e" in parsed["extra"]["aborted"]


def test_emit_without_config1(capsys):
    bench._emit({}, aborted_stage="config1_monoexp_noisy")
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["value"] == 0.0
    assert parsed["vs_baseline"] == 0.0


@pytest.mark.timeout(60)
def test_watchdog_emits_partial_json_on_stall():
    code = """
import time
import bench
bench._start_watchdog()
bench._mark("config1_monoexp_noisy")
bench._PROGRESS["results"]["config1_monoexp_noisy"] = {
    "voxels_per_sec": 2.0e9, "scipy_baseline_voxels_per_sec": 4.0e3}
bench._mark("config2_qdess_e2e")
time.sleep(30)
raise SystemExit("watchdog did not fire")
"""
    env = dict(os.environ, DOSMA_BENCH_STALL_SECONDS="2", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=55,
    )
    assert proc.returncode == 0, proc.stderr
    parsed = json.loads(proc.stdout.strip().splitlines()[-1])
    assert parsed["value"] == 2.0e9
    assert "stalled" in parsed["extra"]["aborted"]
    assert "WATCHDOG" in proc.stderr
