"""scripts/trace_roofline.py: trace parsing against a synthetic profile.

The roofline numbers in BASELINE.md come from this parser run on a real
flagship trace; here a hand-built chrome-trace with known overlapping
device ops pins down the span-vs-busy accounting (ops overlap on parallel
device lanes, so the roofline denominator must be the track wall span,
not the busy sum).
"""

import gzip
import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
SCRIPT = os.path.join(REPO, "scripts", "trace_roofline.py")


def _load():
    spec = importlib.util.spec_from_file_location("trace_roofline", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_trace(path):
    # two lanes: op A [0, 10ms] and op B [5ms, 15ms] overlap 5ms;
    # wall span = 15ms, busy = 20ms, bytes = 3 GB
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0.0, "dur": 10_000.0,
         "name": "fusion.1",
         "args": {"device_duration_ps": "10000000000",
                  "bytes_accessed": str(2 * 10**9), "hlo_category": "fusion"}},
        {"ph": "X", "pid": 3, "tid": 2, "ts": 5_000.0, "dur": 10_000.0,
         "name": "copy.2",
         "args": {"device_duration_ps": "10000000000",
                  "bytes_accessed": str(1 * 10**9), "hlo_category": "copy"}},
        # host event without device_duration_ps must be ignored
        {"ph": "X", "pid": 1, "tid": 1, "ts": 0.0, "dur": 99_000.0,
         "name": "host_thing", "args": {"bytes_accessed": "999999999999"}},
        # envelope lane event (like "Steps"/"XLA Modules"): has
        # device_duration_ps spanning the window but no hlo_category —
        # must NOT count toward busy-sum (would fake overlap)
        {"ph": "X", "pid": 3, "tid": 9, "ts": 0.0, "dur": 15_000.0,
         "name": "envelope_step", "args": {
             "device_duration_ps": "15000000000", "bytes_accessed": "0"}},
    ]
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_analyze_span_and_bytes(tmp_path, capsys):
    trace = tmp_path / "vm.trace.json.gz"
    _write_trace(str(trace))
    mod = _load()
    mod.analyze(str(trace), steps=3, top=5)
    out = capsys.readouterr().out
    # span 15 ms over 3 steps = 5 ms/step; 3 GB -> 1 GB/step; 200 GB/s
    assert "device span 15.0 ms" in out
    assert "busy-sum 20.0 ms" in out
    assert "1.00 GB/step at 5.00 ms/step = 200 GB/s" in out
    assert "host_thing" not in out
    assert "envelope_step" not in out
    assert "fusion.1" in out and "copy.2" in out


def test_analyze_rejects_op_free_trace(tmp_path):
    trace = tmp_path / "vm.trace.json.gz"
    with gzip.open(str(trace), "wt") as f:
        json.dump({"traceEvents": [
            {"ph": "X", "pid": 1, "tid": 1, "ts": 0.0, "dur": 5.0,
             "name": "host_only", "args": {}}]}, f)
    mod = _load()
    import pytest

    with pytest.raises(SystemExit):
        mod.analyze(str(trace), steps=1, top=5)


def test_find_trace_latest(tmp_path):
    mod = _load()
    old = tmp_path / "a" / "vm.trace.json.gz"
    new = tmp_path / "b" / "vm.trace.json.gz"
    for p in (old, new):
        p.parent.mkdir()
        _write_trace(str(p))
    os.utime(str(old), (1, 1))
    assert mod.find_trace(str(tmp_path)) == str(new)


def test_cli_invocation(tmp_path):
    trace = tmp_path / "vm.trace.json.gz"
    _write_trace(str(trace))
    out = subprocess.run(
        [sys.executable, SCRIPT, str(trace), "--steps", "3"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "GB/step" in out.stdout
