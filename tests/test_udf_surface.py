"""UDF/UDTF surface (SURVEY §2.3): grouped applyInPandas, scalar
pandas_udf registered for SQL, and a Python UDTF — each checked against
the equivalent built-in plan, because at scale the JVM path is the one
that ships and the Python path must agree with it."""

from __future__ import annotations

import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

from ingest_spark.catalog import load_table
from ingest_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_grouped_apply_in_pandas_matches_window_plan(spark):
    """Z-score via applyInPandas == z-score via window aggregates."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "zscore": ((v - v.mean()) / v.std(ddof=1)).round(6)}
        )

    ev = load_table(spark, SF_DIR, "events")
    via_pandas = (
        ev.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(normalize, "event_id long, zscore double")
    )
    via_window = QUERIES["zscore_by_event_type"](spark, SF_DIR)
    a = {r.event_id: r.zscore for r in via_pandas.collect()}
    b = {r.event_id: r.zscore for r in via_window.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)


def test_zscore_rewrite_keeps_null_group(spark, tmp_path):
    """ADVICE r6: the window->broadcast-join rewrite must keep rows
    whose event_type is NULL as their own partition (the oracle's
    PARTITION BY semantics) — a plain inner equi-join drops them.
    Pinned on a synthetic events table with a NULL group, since the
    standard fixtures have none."""
    import duckdb

    from datetime import datetime as DT

    ts = DT(2024, 1, 1, 9)
    rows = [
        (1, "click", 10.0, ts),
        (2, "click", 20.0, ts),
        (3, None, 5.0, ts),
        (4, None, 9.0, ts),
        (5, None, 1.0, ts),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp"
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.event_id: r.zscore
        for r in QUERIES["zscore_by_event_type"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    want = dict(
        con.execute(
            "SELECT event_id, round((value - avg(value) OVER (PARTITION BY event_type))"
            " / stddev_samp(value) OVER (PARTITION BY event_type), 6) FROM events"
        ).fetchall()
    )
    assert got.keys() == want.keys()  # NULL group must survive
    assert all(abs(got[k] - want[k]) < 1e-9 for k in got)


def test_registered_pandas_udf_callable_from_sql(spark):
    @F.pandas_udf("double")
    def vec_norm(arrs: pd.Series) -> pd.Series:
        return arrs.map(lambda v: float(sum(x * x for x in v)) ** 0.5)

    spark.udf.register("vec_norm", vec_norm)
    load_table(spark, SF_DIR, "embeddings").createOrReplaceTempView("emb_udf_test")
    out = spark.sql(
        "SELECT vec_id, round(vec_norm(embedding), 4) AS n FROM emb_udf_test ORDER BY vec_id LIMIT 5"
    ).collect()
    # cross-check against the JVM higher-order-function norm
    jvm = spark.sql(
        """SELECT vec_id, round(sqrt(aggregate(embedding, 0.0D,
               (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS n
           FROM emb_udf_test ORDER BY vec_id LIMIT 5"""
    ).collect()
    assert [(r.vec_id, r.n) for r in out] == [(r.vec_id, r.n) for r in jvm]


def test_python_udtf_explodes_key_value_pairs(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="k string, v string")
    class ParseKV:
        def eval(self, s: str):
            for pair in (s or "").split(","):
                if "=" in pair:
                    k, v = pair.split("=", 1)
                    yield k.strip(), v.strip()

    spark.udtf.register("parse_kv", ParseKV)
    out = spark.sql(
        "SELECT * FROM parse_kv('region=dk, source=energinet, unit=kwh')"
    ).collect()
    assert [(r.k, r.v) for r in out] == [
        ("region", "dk"),
        ("source", "energinet"),
        ("unit", "kwh"),
    ]


def test_grouped_agg_pandas_udf_matches_builtin(spark):
    """GROUPED_AGG pandas UDF (a numpy UDAF) == the built-in aggregate
    plan — the escape hatch for aggregations Spark lacks, verified
    against one it has."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        return float(np.average(v.to_numpy(), weights=w.to_numpy()))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "w", (F.col("event_id") % 7 + 1).cast("double")
    )
    got = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type").agg(wmean("value", "w").alias("m")).collect()
    }
    expect = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg((F.sum(F.col("value") * F.col("w")) / F.sum("w")).alias("m"))
        .collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9


def test_map_in_arrow_matches_builtin_projection(spark):
    """mapInArrow (zero-copy RecordBatch transform) == the equivalent
    Column projection; the lowest-overhead Python hook for columnar
    libraries that speak Arrow natively."""
    import pyarrow as pa

    def double_value(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            out = t.set_column(
                t.schema.get_field_index("value"),
                "value",
                pa.compute.multiply(t["value"], 2.0),
            )
            yield from out.to_batches()

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_id", "value")
    got = ev.mapInArrow(double_value, "event_id long, value double")
    expect = ev.select("event_id", (F.col("value") * 2.0).alias("value"))
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
