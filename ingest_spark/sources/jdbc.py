"""JDBC import/export (reference S7: the Sqoop+Postgres pod,
cluster/storage/sqoop.yaml:39-50).

Spark-native replacement: ``spark.read.jdbc`` with explicit partition
bounds so the import parallelizes across executors instead of Sqoop
map tasks. The builders are database-agnostic; in this sandbox they
EXECUTE against the Apache Derby engine Spark bundles for its Hive
metastore (``jdbc:derby:memory:...;create=true`` — an embedded
in-JVM database, so local-mode executors reach it), which is how
test_sources.py proves a real partitioned scan with pushed filters
rather than just option construction. Against a networked database
(the reference's Postgres) the same builders apply — only url/driver
change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.readwriter import DataFrameReader

#: The embedded driver the bundled Derby jars provide — the sandbox
#: execution path. derby_memory_url() scopes a throwaway database to
#: the current JVM.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_memory_url(name: str) -> str:
    """An in-memory Derby database URL (created on first touch, JVM
    lifetime). The sandbox stand-in for the reference's Postgres."""
    return f"jdbc:derby:memory:{name};create=true"


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
    driver bottleneck at any real size). Filters composed onto the
    loaded frame push down into the remote query (PushedFilters in
    the JDBCRelation scan — asserted in test_sources.py)."""
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


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    **properties: str,
) -> None:
    """Export a frame over JDBC (the Sqoop-export direction). Each
    write partition opens its own connection and inserts in
    ``batch_size`` batches — parallelism is the frame's partitioning,
    so repartition() before calling to control connection count
    against a production database.

    Default mode is ``append`` (ADVICE r11: Sqoop-export semantics are
    insert into an existing table; Spark's ``overwrite`` DROPS and
    recreates the target — destroying indexes/grants — so destructive
    modes must be an explicit opt-in, optionally with the JDBC
    ``truncate`` option to keep the table definition)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()
