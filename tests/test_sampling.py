"""Deterministic-sampling operators: reproducibility is the contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingest_spark.operators import dedup, sampling

from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_split_partitions_and_is_stable(spark):
    docs = _docs(spark)
    out = sampling.hash_split(docs, "doc_id", {"train": 80, "val": 10, "test": 10})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # total preserved, no overlap
    # roughly proportional (hash uniformity; generous tolerance at 500 docs)
    assert counts["train"] > counts["val"] + counts["test"]
    # rerun -> identical assignment row-for-row
    again = sampling.hash_split(docs, "doc_id", {"train": 80, "val": 10, "test": 10})
    assert (
        out.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )


def test_hash_split_rejects_bad_percentages(spark):
    import pytest

    with pytest.raises(ValueError):
        sampling.hash_split(_docs(spark), "doc_id", {"train": 80, "test": 10})


def test_hash_sample_is_subset_and_join_stable(spark):
    docs = _docs(spark)
    s10 = sampling.hash_sample(docs, "doc_id", 10)
    s20 = sampling.hash_sample(docs, "doc_id", 20)
    # nested: the 10% sample is contained in the 20% sample
    assert s10.join(s20, "doc_id", "left_anti").count() == 0
    assert 0 < s10.count() < s20.count() < docs.count()


def test_salt_decorrelates(spark):
    docs = _docs(spark)
    a = set(r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 20).collect())
    b = set(
        r["doc_id"]
        for r in sampling.hash_sample(docs, "doc_id", 20, salt=1).collect()
    )
    assert a != b  # different salt -> different (still deterministic) sample


def test_stratified_rates(spark):
    docs = _docs(spark)
    out = sampling.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0}, default_rate=100
    )
    assert out.filter(F.col("lang") == "en").count() == 0
    non_en = docs.filter(F.col("lang") != "en").count()
    assert out.count() == non_en  # rate-100 strata fully kept


def test_keep_best_survivor_is_longest(spark):
    rows = [
        (1, "g1", 10),
        (2, "g1", 30),
        (3, "g1", 30),  # tie on length -> min doc_id wins
        (4, "g2", 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n_chars"])
    out = dedup.keep_best(df, "grp", [F.col("n_chars").desc(), F.col("doc_id")])
    got = {r["grp"]: r["doc_id"] for r in out.collect()}
    assert got == {"g1": 2, "g2": 4}
