"""bench.py's dead-backend fallback: the driver must always get ONE
parseable JSON line with the contract keys, even when the accelerator
tunnel is unreachable at bench time (observed 2026-08-17/18: the axon
relay died mid-round and a device fetch wedges forever)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_stale_fallback_line_contract():
    line = bench.stale_fallback_line()
    assert line is not None, "benchmarks/last_tpu_bench.json missing"
    assert "\n" not in line.strip()
    d = json.loads(line)
    # The driver's contract keys.
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in d
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    # Never silently pass off a stale number as a fresh measurement.
    assert d["stale"] is True
    assert "unreachable" in d["note"]
    assert d.get("measured_at")


def test_stale_fallback_missing_file():
    assert bench.stale_fallback_line("/nonexistent/x.json") is None
