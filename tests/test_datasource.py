"""Python DataSource (windowed_rest): the S1/S3 fetch loop as a
registered Spark source with partition-parallel windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingest_spark.sources.rest_datasource import (
    WindowedRestDataSource,
    synthetic_fetch,
)

SCHEMA = "ts timestamp, user_id bigint, value double"


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(WindowedRestDataSource)
    return spark


def _load(spark, start="2024-01-01", end="2024-01-08", **opts):
    reader = (
        spark.read.format("windowed_rest")
        .schema(SCHEMA)
        .option("start", start)
        .option("end", end)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_reads_every_window_row(registered):
    df = _load(registered)
    assert df.count() == 7 * 24  # hourly synthetic rows across 7 day-windows
    # deterministic: same read twice -> identical contents
    assert df.exceptAll(_load(registered)).count() == 0


def test_one_partition_per_window(registered):
    df = _load(registered, step_days="2")
    assert df.rdd.getNumPartitions() == 4  # ceil(7/2) windows
    assert df.count() == 7 * 24


def test_matches_driver_side_fetch(registered):
    """The distributed read returns exactly what the fetch function
    yields when called directly (no rows lost/duplicated at window
    boundaries)."""
    from datetime import datetime

    expect = []
    for d in range(7):
        expect.extend(
            synthetic_fetch(
                datetime(2024, 1, 1 + d), datetime(2024, 1, 2 + d)
            )
        )
    got = sorted(
        (r["ts"], r["user_id"], r["value"]) for r in _load(registered).collect()
    )
    assert got == sorted((r["ts"], r["user_id"], r["value"]) for r in expect)


def test_composes_with_query_surface(registered):
    df = _load(registered)
    out = (
        df.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day")
        .collect()
    )
    assert len(out) == 7 and all(r["n"] == 24 for r in out)


def test_bad_options_fail_at_planning(registered):
    with pytest.raises(Exception):
        _load(registered, start="2024-02-01", end="2024-01-01").count()
    with pytest.raises(Exception):
        _load(registered, fetch="no_such_module:fn").count()
