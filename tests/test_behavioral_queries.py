"""Hand-computed expectations for the newest behavioral/quality queries.

The DuckDB oracle harness proves Spark and DuckDB agree; these pin the
*intended* numbers on tiny fixtures so a formulation error shared by
both engine expressions (same wrong SQL on both sides) cannot pass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingest_spark.queries import (
    ewma_daily_value,
    ohlc_hourly,
    rolling_active_users,
    word_entropy,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_rolling_active_users_hand_computed(spark, tmp_path):
    # day 1: u1,u2;  day 2: u1;  day 9: u3  (days 3-8 silent)
    sf = _write_events(spark, tmp_path, [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 11:00:00", 2, "view", 0.0),
        (3, "2024-01-01 12:00:00", 1, "view", 0.0),  # dup (u1, day1)
        (4, "2024-01-02 10:00:00", 1, "view", 0.0),
        (5, "2024-01-09 10:00:00", 3, "view", 0.0),
    ])
    out = {str(r["day"]): (r["dau"], r["wau"])
           for r in rolling_active_users(spark, sf).collect()}
    # only observed days appear — no synthetic day rows from the fan-out
    assert sorted(out) == ["2024-01-01", "2024-01-02", "2024-01-09"]
    assert out["2024-01-01"] == (2, 2)
    # WAU(d2) window [d-6, d] still sees u2 from day 1
    assert out["2024-01-02"] == (1, 2)
    # day 9's trailing week [d3..d9] contains only u3
    assert out["2024-01-09"] == (1, 1)


def test_ewma_daily_value_dyadic_weights(spark, tmp_path):
    # one type; daily cents: d0=100, d1=200, (gap), d3=400
    sf = _write_events(spark, tmp_path, [
        (1, "2024-01-01 10:00:00", 1, "view", 1.00),
        (2, "2024-01-02 10:00:00", 1, "view", 2.00),
        (3, "2024-01-04 10:00:00", 1, "view", 4.00),
    ])
    out = {str(r["day"]): (r["day_cents"], r["ewma_cents"])
           for r in ewma_daily_value(spark, sf).collect()}
    assert out["2024-01-01"] == (100, 50.0)            # 100/2
    assert out["2024-01-02"] == (200, 125.0)           # 200/2 + 100/4
    # calendar-age weights across the gap: 400/2 + 200/2^3 + 100/2^4
    assert out["2024-01-04"] == (400, 231.25)


def test_ohlc_hourly_first_last_extremes(spark, tmp_path):
    sf = _write_events(spark, tmp_path, [
        (1, "2024-01-01 10:05:00", 1, "view", 3.00),
        (2, "2024-01-01 10:15:00", 1, "view", 1.00),
        (3, "2024-01-01 10:25:00", 1, "view", 5.00),
        (4, "2024-01-01 10:35:00", 1, "view", 2.00),
        (5, "2024-01-01 11:05:00", 1, "view", 9.00),   # next hour
    ])
    rows = {str(r["hour"]): r for r in ohlc_hourly(spark, sf).collect()}
    r10 = rows["2024-01-01 10:00:00"]
    assert (r10["open"], r10["high"], r10["low"], r10["close"]) == (3.0, 5.0, 1.0, 2.0)
    assert r10["n_events"] == 4
    r11 = rows["2024-01-01 11:00:00"]
    assert (r11["open"], r11["close"]) == (9.0, 9.0)


@pytest.mark.parametrize(
    "text,n,distinct,bits",
    [
        ("a a b b", 4, 2, 1.0),      # uniform over 2 symbols
        ("a a a a", 4, 1, 0.0),      # degenerate
        ("a b c d", 4, 4, 2.0),      # uniform over 4
    ],
)
def test_word_entropy_known_distributions(spark, tmp_path, text, n, distinct, bits):
    spark.createDataFrame(
        [(1, text, "en", "unit", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = word_entropy(spark, str(tmp_path)).first()
    assert (r["n_words"], r["distinct_words"]) == (n, distinct)
    assert r["entropy_bits"] == pytest.approx(bits, abs=1e-9)
