"""JSONSTAT source (reference S4 + T2-T4).

The Statbank producer fetches one nested JSONSTAT document per call
(producers/statbank/fetch_data_statbank.py:22-41) and flattens it to
wide records (:44-89). Here: injectable ``fetch_fn`` returns the raw
JSON string(s); flattening is the declarative operator
(operators.flatten.jsonstat_flatten — posexplode zip, coalesce
fallbacks, default fills)."""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from ingest_spark.operators.flatten import jsonstat_flatten


def ingest_jsonstat(
    spark: SparkSession, fetch_fn: Callable[[], Iterable[str]]
) -> DataFrame:
    """Fetch raw JSONSTAT documents (one JSON string each) and return
    the flattened record table (FIXTURES.md §3 shape)."""
    docs = [(doc,) for doc in fetch_fn()]
    raw = spark.createDataFrame(docs, "raw string")
    return jsonstat_flatten(raw, "raw")
