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


def _drain(q, sink_df, expect_rows, timeout=120):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        if sink_df() >= expect_rows:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)


def test_stream_reader_ingests_and_resumes_exactly_once(registered, tmp_path):
    """S3/T8 as a true streaming source: offsets live in the Spark
    checkpoint. A restart with a WIDER end date must fetch only the
    new windows — each window's rows land exactly once."""
    spark = registered
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start_query(end):
        stream = (
            spark.readStream.format("windowed_rest")
            .schema(SCHEMA)
            .option("start", "2024-01-01")
            .option("end", end)
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 seconds")
            .start()
        )

    q = start_query("2024-01-05")
    _drain(q, lambda: _safe_count(spark, sink), 4 * 24)
    assert _safe_count(spark, sink) == 4 * 24

    # restart, three more days available
    q = start_query("2024-01-08")
    _drain(q, lambda: _safe_count(spark, sink), 7 * 24)
    df = spark.read.parquet(sink)
    assert df.count() == 7 * 24          # nothing refetched, nothing lost
    assert df.select("ts").distinct().count() == 7 * 24


def _safe_count(spark, path):
    try:
        return spark.read.parquet(path).count()
    except Exception:
        return 0
