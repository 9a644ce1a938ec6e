"""JDBC import (reference S7: the Sqoop+Postgres pod,
cluster/storage/sqoop.yaml:39-50).

Spark-native replacement: ``spark.read.jdbc`` with explicit partition
bounds so the import parallelizes across executors instead of Sqoop
map tasks. No driver jar ships in this container, so this module only
*builds* the reader; tests cover option construction."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.readwriter import DataFrameReader


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    **properties: str,
) -> DataFrameReader:
    """Configured JDBC reader. With ``partition_column`` the scan is
    split into ``num_partitions`` range predicates executed in
    parallel (the scale path — a single-connection JDBC read is a
    driver bottleneck at any real size)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader
