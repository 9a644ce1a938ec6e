from __future__ import annotations

from datetime import datetime

import pytest

from ingest_spark.schemas import contract_schema
from ingest_spark.sources.jdbc import jdbc_reader
from ingest_spark.sources.jsonstat import ingest_jsonstat
from ingest_spark.sources.rest import WindowedRestSource, discover_bounds_via_probes
from tests.test_flatten import FULL


def _fake_fetch(calls: list):
    """Fake Energinet API: 2 records per day-window (S1 envelope)."""

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
            for h in range(2)
        ]

    return fetch


def test_windowed_rest_incremental_checkpoint(spark, tmp_path):
    calls: list = []
    src = WindowedRestSource(
        spark,
        _fake_fetch(calls),
        contract_schema("ConsumptionIndustry"),
        str(tmp_path / "ckpt"),
        order_by="HourUTC",
    )
    lo, hi = datetime(2024, 1, 1), datetime(2024, 1, 3)
    out = src.ingest_pending(lo, hi)
    assert out.count() == 6  # 3 windows x 2 records
    assert len(calls) == 3

    # restart: every window is checkpointed -> zero fetches (T8)
    out2 = src.ingest_pending(lo, hi)
    assert out2.count() == 0
    assert len(calls) == 3

    # extend the range: only the new window is fetched
    out3 = src.ingest_pending(lo, datetime(2024, 1, 4))
    assert out3.count() == 2
    assert len(calls) == 4


def test_window_planning_is_declarative(spark, tmp_path):
    src = WindowedRestSource(
        spark, lambda s, e: [], contract_schema("ConsumptionIndustry"), str(tmp_path)
    )
    plan = src.plan_windows(datetime(2024, 1, 1), datetime(2024, 1, 10))
    rows = plan.orderBy("window_idx").collect()
    assert len(rows) == 10
    assert rows[0]["window_start"] == datetime(2024, 1, 1)
    assert rows[0]["window_end"] == datetime(2024, 1, 2)


def test_bounds_probe_guard():
    lo, hi = discover_bounds_via_probes(
        lambda: datetime(2020, 1, 1), lambda: datetime(2021, 1, 1)
    )
    assert (lo, hi) == (datetime(2020, 1, 1), datetime(2021, 1, 1))
    with pytest.raises(ValueError, match="invalid range"):
        discover_bounds_via_probes(
            lambda: datetime(2022, 1, 1), lambda: datetime(2021, 1, 1)
        )


def test_jsonstat_source_flattens(spark):
    out = ingest_jsonstat(spark, lambda: [FULL])
    assert out.count() == 3
    assert out.first()["source"] == "Statistics Denmark"


def test_jdbc_reader_options(spark):
    reader = jdbc_reader(
        spark,
        "jdbc:postgresql://db:5432/x",
        "public.t",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert reader is not None
    with pytest.raises(ValueError, match="lower_bound"):
        jdbc_reader(spark, "jdbc:postgresql://db/x", "t", partition_column="id")
