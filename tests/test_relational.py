from __future__ import annotations

from pyspark.sql import functions as F

from ingest_spark.operators.relational import as_of_join, salted_join, top_n_per_group


def test_as_of_join_latest_prior(spark):
    left = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", "L1"),
         ("u1", "2024-01-01 12:00:00", "L2"),
         ("u2", "2024-01-01 10:00:00", "L3")],
        "user string, ts_s string, tag string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    right = spark.createDataFrame(
        [("u1", "2024-01-01 09:00:00", 1.0),
         ("u1", "2024-01-01 11:00:00", 2.0),
         ("u2", "2024-01-01 10:00:00", 3.0),   # equal ts -> matches (<=)
         ("u2", "2024-01-01 11:00:00", 4.0)],  # future -> never matches
        "user string, ts_s string, price double",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    out = {r["tag"]: (r["price_asof"], r["ts_asof"]) for r in
           as_of_join(left, right, ["user"], "ts", "ts", ["price"]).collect()}
    assert out["L1"][0] == 1.0   # latest right <= 10:00 is 09:00
    assert out["L2"][0] == 2.0   # 11:00 beats 09:00
    assert out["L3"][0] == 3.0   # equality included
    # left columns survive untouched
    assert set(out) == {"L1", "L2", "L3"}


def test_as_of_join_no_match_is_null(spark):
    left = spark.createDataFrame(
        [("u1", "2024-01-01 08:00:00")], "user string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    right = spark.createDataFrame(
        [("u1", "2024-01-01 09:00:00", 1.0)], "user string, ts_s string, price double"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    r = as_of_join(left, right, ["user"], "ts", "ts", ["price"]).first()
    assert r["price_asof"] is None and r["ts_asof"] is None


def test_top_n_per_group(spark):
    df = spark.createDataFrame(
        [("g", i, float(100 - i)) for i in range(10)], "grp string, id int, score double"
    )
    out = top_n_per_group(df, ["grp"], [F.col("score").desc(), F.col("id")], 3)
    assert [r["id"] for r in out.orderBy("rank").collect()] == [0, 1, 2]


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(k, i) for k in ("a", "b") for i in range(50)], "key string, v int"
    )
    dim = spark.createDataFrame([("a", "A"), ("b", "B")], "key string, name string")
    plain = fact.join(dim, "key").groupBy("key").count()
    salted = salted_join(fact, dim, "key", salt_buckets=4).groupBy("key").count()
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_sessionize_gap_semantics(spark):
    """Events 29 min apart chain into one session; a 31-min gap
    splits. Session ids are 1-based per user in time order."""
    from __spark_entry__ import queries

    rows = [
        (1, "2024-01-01T00:00:00", 10, "click", 1.0, "{}"),
        (2, "2024-01-01T00:29:00", 10, "click", 1.0, "{}"),   # same session
        (3, "2024-01-01T01:00:01", 10, "click", 1.0, "{}"),   # 31m 1s -> new
        (4, "2024-01-01T00:10:00", 20, "view", 1.0, "{}"),    # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            (r.user_id, r.session_id): r.n_events
            for r in queries()["sessionize_events"](spark, d).collect()
        }
    assert out == {(10, 1): 2, (10, 2): 1, (20, 1): 1}


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with
    ZERO Exchange operators — the co-located-join scale path."""
    from ingest_spark.operators.relational import bucket_write

    orders = spark.range(0, 1000).selectExpr("id AS o_key", "id * 2 AS amount")
    cust = spark.range(0, 100).selectExpr("id AS o_key", "concat('c', id) AS name")
    bucket_write(orders, str(tmp_path / "o"), "bt_orders", "o_key", num_buckets=4)
    bucket_write(cust, str(tmp_path / "c"), "bt_cust", "o_key", num_buckets=4)
    try:
        j = (
            spark.table("bt_orders")
            .hint("merge")  # force SMJ so broadcast doesn't mask bucketing
            .join(spark.table("bt_cust"), "o_key")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_cust")
