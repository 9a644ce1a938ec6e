"""bench.py must never ship broken again (round 3 published no bench
number because one query crashed at analysis time — VERDICT r3 §1).
Runs the real harness as the driver does, in a subprocess, at the
smallest SF, and validates the one-line JSON contract.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_runs_and_emits_contract_json():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="8", SPARK_GRAFT_STEADY_PASSES="2",
               SPARK_GRAFT_STREAM_ROWS="5000")
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    # full per-query line + tail-safe steady dict (VERDICT r9 #6) +
    # engine-only checksum leg (VERDICT r10 #5) + the compact
    # tail-safe summary (VERDICT r8 #8)
    assert len(json_lines) == 4, proc.stdout[-2000:]
    d = json.loads(json_lines[0])
    assert d["metric"] == "headline_suite_wall_sec"
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["sf"] == 0.001
    steady = json.loads(json_lines[1])
    assert steady["metric"] == "per_query_steady_sec"
    assert steady["queries"] == d["queries"]
    import bench

    ck = json.loads(json_lines[2])
    assert ck["metric"] == "per_query_checksum_sec"
    assert set(ck["queries"]) == set(bench.ROW_HEAVY)
    assert all(
        v["n"] > 0 and v["crc_sum"] is not None for v in ck["values"].values()
    )
    compact = json.loads(json_lines[3])
    assert compact["metric"] == "headline_suite_wall_sec"
    assert compact["total_steady"] == d["value"] == d["total_steady"]
    assert compact["total_cold"] == d["total_cold"] == d["value_cold"]
    # the steady total EXCLUDES the I/O-bimodal seeding entries (r10 #6,
    # r13 split) — recorded per-query, never summed
    assert sorted(compact["total_excludes"]) == [
        "incremental_ingest_e2e",
        "incremental_ingest_seed",
    ]
    assert abs(
        sum(
            v
            for n, v in d["queries"].items()
            if n not in set(compact["total_excludes"])
        )
        - d["value"]
    ) < 0.01
    # r16 (VERDICT r15 §Wrong #4 / §Next #7): the driver parses the
    # LAST line, and PERF_r15's comparator came back empty because it
    # carried no `queries`. The final line now holds the full contract
    # (metric/value/unit/queries/sf) and must stay inside the driver's
    # ~2000-char tail capture — measured 1558 chars at 42 queries;
    # this guard fails BEFORE the suite outgrows the capture.
    assert compact["queries"] == d["queries"]
    assert len(json_lines[3]) < 1900, len(json_lines[3])
    # growth guard on the other auxiliary lines (steady dict +
    # checksum leg): recorded BENCH_r*.json files carry the full
    # stdout, so this is a size budget against unbounded suite sprawl
    # (the compact line has its own hard capture bound above)
    assert len(json_lines[1]) + len(json_lines[2]) < 2500, (
        len(json_lines[1]),
        len(json_lines[2]),
    )
    assert set(d["queries"]) == set(bench.HEADLINE)
    assert all(v >= 0 for v in d["queries"].values())
    assert all(v >= 0 for v in d["rows"].values())
    # cold pass is machine-recorded alongside steady-state (r4 §Next #5)
    assert set(d["queries_cold"]) == set(bench.HEADLINE)
    assert all(v >= 0 for v in d["queries_cold"].values()), (
        "a cold pass failed (sentinel -1); see bench stderr"
    )
    assert d["value_cold"] >= d["value"] * 0.5  # both populated, same unit
    # min-of-N steady methodology (r5 §Next #2): median reported
    # alongside the min, and min <= median per query by construction
    assert d["steady_passes"] == 2
    assert set(d["queries_median"]) == set(bench.HEADLINE)
    assert all(
        d["queries"][n] <= d["queries_median"][n] + 1e-9 for n in bench.HEADLINE
    )
    # the streaming leg rides along and must report real throughput
    assert d["streaming"] is not None and d["streaming"]["rows_per_sec"] > 0
    assert d["streaming"]["rows_in"] == 5000


def test_headline_names_are_declared_queries():
    sys.path.insert(0, "/root/repo")
    import bench

    from ingest_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench names not in QUERIES: {missing}"


def test_bench_checksum_mode_emits_engine_only_contract():
    """VERDICT r11 §Next #4: the engine-only checksum leg is the
    canonical round-over-round comparator at every SF, so its output
    contract gets the same never-ship-broken pin as the collect leg:
    SPARK_GRAFT_SINK=checksum must produce the same 4-line JSON shape,
    flagged sink=checksum, with non-negative per-query walls and real
    row counts (the checksum sink counts rows JVM-side)."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="8", SPARK_GRAFT_STEADY_PASSES="1",
               SPARK_GRAFT_STREAM_ROWS="5000",
               SPARK_GRAFT_SINK="checksum")
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    # 3 lines, not 4: the separate ROW_HEAVY checksum leg is redundant
    # when the whole suite already runs through the checksum sink
    assert len(json_lines) == 3, proc.stdout[-2000:]
    d = json.loads(json_lines[0])
    compact = json.loads(json_lines[2])
    import bench

    assert compact["sink"] == "checksum"
    assert d["value"] > 0
    assert set(d["queries"]) == set(bench.HEADLINE)
    assert all(v >= 0 for v in d["queries"].values())
    # the checksum sink still counts every result row JVM-side
    assert all(v >= 0 for v in d["rows"].values())
    assert any(v > 0 for v in d["rows"].values())
