"""Full-surface oracle sweep under pytest (VERDICT r3 §Next #3).

The driver's correctness gate is frozen at the 50 round-1 query names,
so every query added since rides only on the manual harness
(tests/oracle_harness.py). This test parametrizes over ALL declared
queries at sf0.001 and runs the exact same DuckDB comparison, so a
regression in any of the non-driver-gated queries fails CI.

Oracle-less queries (sketches, recall-bound ANN variants) get a
rows-only execution check — the same weaker gate the driver records.
"""

from __future__ import annotations

import pytest

from oracle_harness import compare_query, duck_connection

from ingest_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


# Queries whose result is legitimately empty at sf0.001 (and ONLY
# there — each must be nonzero at sf0.01, checked when added).
# Currently none: tpch_q11 left this set when its share threshold
# became mean-relative (scale-free) in r9.
EMPTY_AT_SF0001_OK: set[str] = set()


@pytest.fixture(scope="module")
def duck_sf01():
    con = duck_connection("/root/testdata/sf0.01")
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck_sf1():
    con = duck_connection("/root/testdata/sf0.1")
    yield con
    con.close()


# one vacuity check per DISTINCT oracle SQL: queries that share an
# oracle verbatim (incremental_ingest_batch reuses the e2e recompute —
# the heaviest SQL in the registry) would otherwise execute it twice
# per SF leg for a guaranteed-identical row count (r10 review)
_DISTINCT_ORACLE_NAMES = sorted(
    {sql: name for name, sql in sorted(ORACLES.items(), reverse=True)}.values()
)


@pytest.mark.parametrize("name", _DISTINCT_ORACLE_NAMES)
def test_oracle_not_vacuous(duck, duck_sf01, duck_sf1, name):
    """Guard the r9 defect class: an oracle that returns 0 rows makes
    the equivalence check pass vacuously (0 == 0) while the operator
    under test never touches a row — curation_e2e shipped that way
    for four rounds (EN-stopword gate vs synthetic vocabulary), and
    three join queries had literals matching nothing in this data.
    Checked at ALL THREE SFs (r10, VERDICT r9 §Next #5 — the sf0.1
    leg was a manual scan before) because thresholds cut both ways
    with corpus size: the dead join literals were empty everywhere;
    pmi_collocations' fixed min-support of 50 was nonzero at sf0.001
    (one pair at 51) yet zero at sf0.01 (max pair count 48); and
    tpch_q11's old fixed share cut was nonzero at sf0.01 but ZERO at
    sf0.1 — the bench SF, where no in-CI guard would have seen it.
    DuckDB-side only, so the whole surface costs seconds."""
    if name not in EMPTY_AT_SF0001_OK:
        n = len(duck.execute(ORACLES[name]).fetchall())
        assert n > 0, f"{name}: oracle returns 0 rows at sf0.001 — vacuous pass"
    n = len(duck_sf01.execute(ORACLES[name]).fetchall())
    assert n > 0, f"{name}: oracle returns 0 rows at sf0.01 — vacuous pass"
    n = len(duck_sf1.execute(ORACLES[name]).fetchall())
    assert n > 0, f"{name}: oracle returns 0 rows at sf0.1 — vacuous pass"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    fn = QUERIES[name]
    if name not in ORACLES:
        # rows-only: must at least execute and return a stable schema
        df = fn(spark, SF_DIR)
        assert df.columns
        assert df.count() >= 0
        return
    problems = compare_query(spark, duck, name, fn, ORACLES[name], SF_DIR)
    assert not problems, f"{name}: " + " | ".join(problems)


# ------------------------------------------------------- sf0.01 leg (r13)
#
# VERDICT r12 §Next #2: 119 of the 178 registry queries are never
# driver-checked (that gate is frozen at the 50 round-1 names) and their
# only value-hash comparison ran at sf0.001 — scale-dependent divergence
# (corpus-adaptive thresholds, ties, float accumulation order) was
# invisible. This leg runs the IDENTICAL comparison at sf0.01 (the
# driver's own correctness scale). It costs ~15 min of Spark time, so
# it is opt-in: SPARK_GRAFT_SWEEP_SF01=1, run once per round (recorded
# in PROGRESS.jsonl / the round notes).

_SF01_ENABLED = __import__("os").environ.get("SPARK_GRAFT_SWEEP_SF01") == "1"


@pytest.mark.skipif(
    not _SF01_ENABLED,
    reason="sf0.01 full sweep is opt-in: set SPARK_GRAFT_SWEEP_SF01=1",
)
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_sf01(spark, duck_sf01, name):
    fn = QUERIES[name]
    sf_dir = "/root/testdata/sf0.01"
    if name not in ORACLES:
        df = fn(spark, sf_dir)
        assert df.columns
        assert df.count() >= 0
        return
    problems = compare_query(spark, duck_sf01, name, fn, ORACLES[name], sf_dir)
    assert not problems, f"{name}: " + " | ".join(problems)
