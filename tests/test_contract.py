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
