"""SURVEY §5.3 full-lifecycle e2e: the reference's whole happy path
(bounds discovery -> windowed REST ingest with a replayed day ->
contract apply -> content-hash dedup -> date-partitioned sink ->
typed-view SQL) as ONE test with exact expected numbers."""

from __future__ import annotations

import sys
from datetime import datetime

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from ingest_spark.operators import dedup
from ingest_spark.schemas.contracts import contract_schema
from ingest_spark.sources.rest import WindowedRestSource


def _api(calls):
    """Fake Energinet API: 24 hourly rows per requested day; records a
    call log so we can assert the checkpoint skipped replayed days."""

    def fetch(start: datetime, end: datetime):
        calls.append(start)
        day = start.strftime("%Y-%m-%d")
        return [
            {
                "HourUTC": f"{day}T{h:02d}:00:00",
                "HourDK": f"{day}T{h + 1:02d}:00:00",
                "MunicipalityNo": "101",
                "Branche": "Erhverv",
                "ConsumptionkWh": float(h),
            }
            for h in range(24)
        ]

    return fetch


def test_full_reference_lifecycle(spark, tmp_path):
    schema = contract_schema("ConsumptionIndustry")
    calls: list[datetime] = []
    src = WindowedRestSource(
        spark, _api(calls), schema, checkpoint_dir=str(tmp_path / "ckpt")
    )

    # day 1-2 ingest
    lo, hi = datetime(2024, 1, 1), datetime(2024, 1, 2)
    batch1 = src.ingest_pending(lo, hi)
    assert batch1.count() == 48 and len(calls) == 2

    # restart + widened range: checkpoint must skip days 1-2 (T8)
    batch2 = src.ingest_pending(datetime(2024, 1, 1), datetime(2024, 1, 3))
    assert len(calls) == 3  # only day 3 fetched
    assert batch2.count() == 24

    # at-least-once upstream: day 3 arrives AGAIN (replay) -> dedup (T5/T6)
    replayed = batch2.unionByName(batch2)
    merged = batch1.unionByName(replayed)
    assert merged.count() == 48 + 48
    clean = dedup.exact_dedup(merged)
    assert clean.count() == 72  # 3 days x 24 hours, exactly once

    # K2: date-partitioned sink; partition pruning on read-back
    sink = str(tmp_path / "sink")
    clean.withColumn("day", F.to_date(F.col("HourUTC").cast("timestamp"))).write.partitionBy(
        "day"
    ).parquet(sink)

    # Q1: typed view + SQL over the sink
    spark.read.parquet(sink).createOrReplaceTempView("consumption")
    out = spark.sql(
        """
        SELECT day, count(*) AS n, round(sum(ConsumptionkWh), 2) AS total_kwh
        FROM consumption GROUP BY day ORDER BY day
        """
    ).collect()
    assert [(str(r.day), r.n, r.total_kwh) for r in out] == [
        ("2024-01-01", 24, 276.0),
        ("2024-01-02", 24, 276.0),
        ("2024-01-03", 24, 276.0),
    ]
