"""bench.py artifact robustness (VERDICT r2 item 1).

The driver captures `python bench.py` stdout into BENCH_r{N}.json; the axon
tunnel has two observed failure modes — a fast backend RuntimeError
(BENCH_r02) and an indefinite hang of jax.devices() (CLAUDE.md). In BOTH
modes the artifact must still be one parseable JSON line with an "error"
field, never a raw traceback or a stall.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run_bench(env_extra, timeout=120):
    env = dict(os.environ, **env_extra)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=timeout)


def _parse_single_json_line(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one output line, got: {lines!r}"
    return json.loads(lines[0])


def test_bench_dead_backend_emits_parseable_error():
    """Fast-fail mode: an uninitializable platform must produce one JSON
    line with error + null value and a nonzero exit code."""
    p = _run_bench({"ARDAE_BENCH_FORCE_PLATFORM": "nonexistent"})
    assert p.returncode != 0
    out = _parse_single_json_line(p.stdout)
    assert out["value"] is None
    assert "error" in out and "backend" in out["error"]
    assert out["metric"].startswith("dbMNIST")


def test_bench_hung_backend_times_out_parseably():
    """Hang mode (the dead axon tunnel hangs jax.devices()): the subprocess
    preflight must kill the probe at the timeout and emit the JSON error."""
    p = _run_bench({"ARDAE_BENCH_FORCE_PLATFORM": "__hang__",
                    "ARDAE_BENCH_PREFLIGHT_TIMEOUT": "5"}, timeout=90)
    assert p.returncode != 0
    out = _parse_single_json_line(p.stdout)
    assert out["value"] is None
    assert "timed out" in out["error"]


@pytest.mark.slow
def test_bench_green_path_on_cpu():
    """Forced onto CPU at smoke sizes (same code path), bench must emit the
    full multi-row artifact (the v2 format that has never reached a driver
    artifact — VERDICT r2)."""
    p = _run_bench({"ARDAE_BENCH_FORCE_PLATFORM": "cpu",
                    "ARDAE_BENCH_SMOKE": "1"}, timeout=3000)
    assert p.returncode == 0, p.stdout + p.stderr
    out = _parse_single_json_line(p.stdout)
    assert out["value"] is not None and out["value"] > 0
    assert out["platform"] == "cpu"
    assert len(out["rows"]) == 3
    assert out["spread"][0] <= out["value"] <= out["spread"][1]
    for row in out["rows"]:
        assert ("error" in row) or (row["steps_per_sec"] > 0)
