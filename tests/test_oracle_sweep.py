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
