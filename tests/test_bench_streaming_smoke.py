"""bench_streaming.py must keep its one-line JSON contract (VERDICT
r5 §Next #6): runs the real harness in a subprocess at a small row
count and validates structure + sane values, exactly as
test_bench_smoke does for the batch harness.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_streaming_bench_runs_and_emits_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_STREAM_ROWS="5000",
        SPARK_GRAFT_STREAM_FILES="4",
        SPARK_GRAFT_CPUS="8",
    )
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench_streaming.py"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    d = json.loads(json_lines[0])
    assert d["metric"] == "streaming_rows_per_sec"
    assert d["unit"] == "rows/sec" and d["value"] > 0
    assert d["rows_in"] == 5000
    # AvailableNow over a real backlog: at least one micro-batch ran
    assert d["batches"] >= 1
    assert d["wall_sec"] > 0
    assert d["dedup_only"]["rows_per_sec"] > 0
    assert d["dedup_only"]["batches"] >= 1
    # the Python-state sessionize leg drains, terminates, and reports
    assert d["sessionize"]["rows_per_sec"] > 0
    assert d["sessionize"]["batches"] >= 1
