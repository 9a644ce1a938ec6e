"""SCALE_RUNS.jsonl ledger contract (VERDICT r6 §Next #6) and the
degree-ordered triangle orientation's correctness invariance
(VERDICT r6 §Next #2)."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

from ingest_spark.operators import graph
from tools import scale_runs
from tools.scale_run_triangles import build_graph


def test_record_contract(tmp_path):
    """record() stamps ts, validates keys, writes one JSON line per
    call, and read_ledger round-trips them."""
    ledger = str(tmp_path / "ledger.jsonl")
    e = scale_runs.record(
        {"op": "demo", "params": {"n": 5}, "wall_sec": 1.2, "checksum": [3, 4]},
        path=ledger,
    )
    assert e["ts"].endswith("Z")
    scale_runs.record(
        {"op": "demo2", "params": {}, "wall_sec": 0.1, "checksum": 7,
         "agree": True},
        path=ledger,
    )
    got = scale_runs.read_ledger(ledger)
    assert [r["op"] for r in got] == ["demo", "demo2"]
    for r in got:
        for k in scale_runs.REQUIRED:
            assert k in r, k
    # each line is independently parseable JSON
    with open(ledger) as fh:
        assert all(json.loads(ln) for ln in fh)


def test_record_rejects_bad_entries(tmp_path):
    ledger = str(tmp_path / "ledger.jsonl")
    with pytest.raises(ValueError, match="missing"):
        scale_runs.record({"op": "x", "params": {}}, path=ledger)
    with pytest.raises(ValueError, match="params"):
        scale_runs.record(
            {"op": "x", "params": 3, "wall_sec": 1, "checksum": 1},
            path=ledger,
        )


def test_repo_ledger_has_current_entries():
    """The repo ledger exists and every line honors the contract —
    the round's closing step appends fresh rows via the cheap-subset
    CLI, so regressions stay diffable round-over-round."""
    rows = scale_runs.read_ledger()
    assert rows, "SCALE_RUNS.jsonl missing or empty — run tools/scale_runs.py"
    for r in rows:
        for k in scale_runs.REQUIRED:
            assert k in r, (k, r)


def test_triangle_orientation_invariance(spark):
    """Degree-ordered and id-ordered compact-forward must count the
    SAME triangles on a hub-skewed graph (small instance of the
    scale study; the timing half lives in SCALE_RUNS.jsonl)."""
    pairs = build_graph(spark, n_nodes=300, hub_frac=0.5).cache()
    by_deg = graph.triangle_count(pairs, degree_ordered=True).collect()[0]
    by_id = graph.triangle_count(pairs, degree_ordered=False).collect()[0]
    assert by_deg.n_triangles == by_id.n_triangles > 0
    assert by_deg.n_edges == by_id.n_edges
