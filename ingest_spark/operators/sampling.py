"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB corpus cannot be sampled with ``rand()`` if the pipeline must
be reproducible across reruns, engines, and partitionings — so every
operator here derives its randomness from a SHA-256 content hash
(``stable_hash64``): the same row lands in the same split/sample on
every run of any engine. This generalizes the reference's
content-hash-identity idea (T5, producers/energinet/
fetch_data_energinet.py:68-72) from dedup to sampling.

All operators are pure Column arithmetic — JVM-side, no shuffle, no
UDFs: a sample/split of 100 TB is a codegen'd filter over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ingest_spark.functions.hashing import stable_hash64


def hash_bucket(col: Column | str, num_buckets: int = 100, salt: int = 0) -> Column:
    """Stable bucket in [0, num_buckets) from a key column. The salt
    decorrelates independent uses (e.g. a 1% sample of the test split
    must not preferentially pick rows that hashed low for the split).
    Keys hash by their canonical string form (oracle-portable: DuckDB
    renders CAST(BIGINT AS VARCHAR) identically)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(stable_hash64(c.cast("string"), salt=salt), F.lit(num_buckets))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int],
    out: str = "split",
    salt: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment: ``splits`` maps name ->
    percentage (must sum to 100). A document's split is a function of
    its key alone — stable under reruns, repartitioning, and engine
    swaps, and consistent across tables sharing the key."""
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100, got {splits}")
    bucket = hash_bucket(key_col, 100, salt=salt)
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = bucket < lo + pct
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn(out, expr)


def hash_sample(
    df: DataFrame, key_col: str, percent: int, salt: int = 0
) -> DataFrame:
    """Keep a deterministic ``percent``% of rows by key hash. Unlike
    ``df.sample()`` this is reproducible and join-stable: sampling two
    tables by the same key keeps MATCHING rows on both sides."""
    return df.filter(hash_bucket(key_col, 100, salt=salt) < percent)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-balancing move
    (e.g. keep 100% of low-resource languages, 10% of English). Plain
    Column arithmetic: no shuffle, no per-stratum scans."""
    bucket = hash_bucket(key_col, 100, salt=salt)
    rate = None
    for value, pct in rates.items():
        cond = F.col(stratum_col) == value
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate = rate.otherwise(default_rate) if rate is not None else F.lit(default_rate)
    return df.filter(bucket < rate)
