from __future__ import annotations

from pyspark.sql import functions as F

from ingest_spark.functions.hashing import content_hash, normalized_fingerprint, stable_hash64


def test_null_vs_empty_distinguished(spark):
    df = spark.createDataFrame([("a", None), ("a", "")], "x string, y string")
    hashes = [r[0] for r in df.select(content_hash("x", "y")).collect()]
    assert hashes[0] != hashes[1]


def test_column_order_is_canonicalization(spark):
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    h_xy = df.select(content_hash("x", "y")).first()[0]
    h_yx = df.select(content_hash("y", "x")).first()[0]
    assert h_xy != h_yx  # order is part of the canon — callers sort


def test_content_hash_detects_field_shift(spark):
    # separator prevents ("ab","c") colliding with ("a","bc")
    df = spark.createDataFrame([("ab", "c"), ("a", "bc")], "x string, y string")
    hashes = [r[0] for r in df.select(content_hash("x", "y")).collect()]
    assert hashes[0] != hashes[1]


def test_stable_hash64_range_and_determinism(spark):
    df = spark.createDataFrame([("hello",)], "s string")
    h15 = df.select(stable_hash64("s")).first()[0]
    h7 = df.select(stable_hash64("s", hex_digits=7)).first()[0]
    assert 0 <= h7 < 2**28
    assert 0 <= h15 < 2**60
    assert df.select(stable_hash64("s")).first()[0] == h15


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("different text",)], "t string"
    )
    fps = [r[0] for r in df.select(normalized_fingerprint("t")).collect()]
    assert fps[0] == fps[1]
    assert fps[2] != fps[0]
