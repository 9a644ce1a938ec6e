"""Schema-enforced batch file sources with corrupt-record capture, plus
the small-file compaction remedy.

The reference's HDFS landing zone is written by Kafka Connect with
``flush.size=3`` (cluster/configuration.json:8) — thousands of 3-record
files, the classic small-files problem — and its consumers apply NO
schema or error handling on read (consumer/consumer.py:27-33 crashes on
the first malformed message). Here:

- reads are schema-applied (never inferred — the registry-enforced
  model, fetch_data_energinet.py:220-224) with PERMISSIVE capture of
  malformed rows into a ``_corrupt_record`` column, so one bad record
  quarantines instead of killing the job;
- ``compact`` rewrites a landing directory into target-sized files
  (maxRecordsPerFile + repartition), the operator you run behind any
  flush.size-style micro-batch writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_json_contract(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines under an explicit contract. Returns
    ``(good, quarantined)``: rows that parsed under the schema, and the
    raw text of rows that did not (for replay/inspection — the
    at-least-once answer to silently dropping data)."""
    full = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split_good_bad(full, schema)


def read_csv_contract(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_json_contract`."""
    full = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )
    return _split_good_bad(full, schema)


def _split_good_bad(full: DataFrame, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """Spark refuses plans whose referenced columns are ONLY the
    internal corrupt-record column — and column pruning reduces BOTH
    sides of the split to exactly that under count()-style ops. So the
    parsed batch is materialized ONCE via localCheckpoint: the raw-file
    lineage is severed (every downstream op legal), the files are read
    exactly once, and — unlike .cache(), whose entry would pin executor
    storage for the whole session — checkpoint blocks are reclaimed by
    the ContextCleaner as soon as the returned frames are garbage
    collected."""
    full = full.localCheckpoint()
    good = full.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = full.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL, *schema.fieldNames())
    return good, bad


def read_binary_payloads(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """E5 multimodal landing: opaque payloads as BinaryType rows with
    file metadata (path, length, modificationTime) — the typed-metadata
    + binary-column model; decode happens downstream via the Arrow
    batched UDFs in operators/multimodal.py."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    fmt: str = "parquet",
    target_records_per_file: int = 1_000_000,
    partitions: int | None = None,
) -> int:
    """Rewrite a many-small-files dataset into target-sized files.
    Returns the row count. ``repartition`` bounds parallel writers;
    ``maxRecordsPerFile`` bounds file size — together they turn a
    flush.size=3 landing zone into scan-friendly files without
    changing content."""
    df = spark.read.format(fmt).load(src_path)
    out = df.repartition(partitions) if partitions else df
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", str(target_records_per_file))
        .format(fmt)
        .save(dst_path)
    )
    return spark.read.format(fmt).load(dst_path).count()
