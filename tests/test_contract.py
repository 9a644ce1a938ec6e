"""Driver-contract tests: entry/queries/oracle_sql + a fast sample of
the DuckDB-oracle comparison (the full sweep runs via
``python tests/oracle_harness.py``)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR
from tests.oracle_harness import compare_query, duck_connection

SAMPLE = [
    "flagship_event_rollup",
    "t5_content_hash",
    "tpch_q1_pricing",
    "minhash_signatures",
    "knn_bruteforce",
    "asof_join_events",
]


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"hour", "event_type", "n_events", "sum_value", "avg_value"}


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 87
    # only genuinely oracle-inexpressible ops may omit an oracle
    # (HLL sketch estimates are engine-specific by nature;
    # approx_distinct_sketch gained a deterministic violation-count
    # output in r5 and is oracle-checked now; the langid/BPE rows
    # moved to full oracles in r9 per VERDICT r8 §Next #3)
    assert set(qs) - set(os_) == {
        "ivf_topk",
        "pq_ann_topk",
        "ivf_pq_topk",  # r14: iterative k-means x2, same as ivf/pq
        "approx_percentile_sketch",
        "sketch_rollup_union",
    }


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, name):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    problems = compare_query(spark, duck, name, qs[name], os_[name], SF_DIR)
    assert not problems, problems


def test_approx_sketch_within_tolerance(spark):
    from ingest_spark.queries import approx_distinct_detail

    df = approx_distinct_detail(spark, SF_DIR)
    for r in df.collect():
        rel_err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel_err < 0.05, (r["event_type"], rel_err)
    # and the registered deterministic form reports zero violations
    agg = entry_mod.queries()["approx_distinct_sketch"](spark, SF_DIR).collect()
    assert len(agg) == 1 and agg[0]["n_groups_outside_5pct"] == 0
    assert agg[0]["n_groups"] > 0


def test_approx_percentile_within_tolerance(spark):
    df = entry_mod.queries()["approx_percentile_sketch"](spark, SF_DIR)
    for r in df.collect():
        rel_err = abs(r["approx_p50"] - r["exact_p50"]) / max(abs(r["exact_p50"]), 1e-9)
        assert rel_err < 0.02, (r["event_type"], rel_err)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_rows_only_queries_not_vacuous(spark, sf_dir):
    """VERDICT r10 §Next #7: the four rows-only queries bypass the
    DuckDB vacuity guard by construction (no oracle SQL), so this
    pins non-degenerate output — row counts, full-k distinct neighbor
    sets, non-constant scores, recall floors — at TWO SFs, the same
    two-sided protection the oracle class got in r9 after four
    queries passed on 0 == 0 for rounds."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from ingest_spark.catalog import load_table
    from ingest_spark.operators import similarity as sim

    qs = entry_mod.queries()
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, probe, k=10).collect()
    }
    assert len(exact) == 50  # 5 probes x full k

    for name, recall_floor in (("ivf_topk", 0.5), ("pq_ann_topk", 0.5)):
        rows = qs[name](spark, sf_dir).collect()
        by_q = defaultdict(set)
        for r in rows:
            by_q[r.query_id].add(r.neighbor_id)
        assert len(by_q) == 5, (name, sf_dir, len(by_q))
        assert all(len(v) == 10 for v in by_q.values()), (name, sf_dir)
        # neighbor sets must differ across queries (a constant answer
        # list would satisfy the shape checks while being garbage)
        assert len(set().union(*by_q.values())) > 10, (name, sf_dir)
        sims = {round(r.cosine_sim, 9) for r in rows}
        assert len(sims) > 10, (name, sf_dir, "constant scores")
        hits = {(r.query_id, r.neighbor_id) for r in rows}
        recall = len(exact & hits) / len(exact)
        assert recall >= recall_floor, (name, sf_dir, recall)

    rows = qs["sketch_rollup_union"](spark, sf_dir).collect()
    by_type = {r["event_type"]: r for r in rows}
    assert "ALL" in by_type and len(by_type) >= 4, (sf_dir, sorted(by_type))
    assert all(r["hll_users"] > 0 and r["exact_users"] > 0 for r in rows)
    # each estimate tracks ITS group's exact count (at sf0.001 every
    # user hits every type, so equal estimates are legitimate — the
    # vacuity hazard is zero/degenerate estimates, guarded above)
    for r in rows:
        rel = abs(r["hll_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel < 0.05, (sf_dir, r["event_type"], rel)
    assert by_type["ALL"]["hll_users"] >= max(
        r["hll_users"] for r in rows if r["event_type"] != "ALL"
    )

    rows = qs["approx_percentile_sketch"](spark, sf_dir).collect()
    assert len(rows) >= 4, (sf_dir, len(rows))
    assert len({r["approx_p50"] for r in rows}) > 1, "constant percentiles"
    for r in rows:
        rel = abs(r["approx_p50"] - r["exact_p50"]) / max(
            abs(r["exact_p50"]), 1e-9
        )
        assert rel < 0.02, (sf_dir, r["event_type"], rel)


def test_worker_imports_shipped_from_foreign_cwd():
    """r12: the driver contract runs from an arbitrary cwd; the four
    UDF-bearing multimodal queries import ingest_spark INSIDE Python
    workers (cloudpickle pickles module functions by reference), which
    failed with ModuleNotFoundError whenever the driver's cwd/
    PYTHONPATH excluded the repo. catalog.ensure_worker_imports ships
    the package zip via addPyFile on first load_table. Proven here
    end-to-end: a subprocess with cwd=/tmp and a scrubbed PYTHONPATH
    runs a worker-side-import query at sf0.001."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    code = (
        "import sys; sys.path.insert(0, '/root/repo');\n"
        "from pyspark.sql import SparkSession\n"
        "from ingest_spark.queries import QUERIES\n"
        "spark = (SparkSession.builder.master('local[2]')"
        ".config('spark.sql.shuffle.partitions','4')"
        ".config('spark.ui.enabled','false').getOrCreate())\n"
        "n = QUERIES['multimodal_jpeg420_decode'](spark, "
        "'/root/testdata/sf0.001').count()\n"
        "assert n > 0, n\n"
        "print('WORKER_IMPORT_OK', n)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "WORKER_IMPORT_OK" in proc.stdout, proc.stderr[-2000:]
