"""ingest_spark — a PySpark-native analytics/ingestion engine.

A from-scratch re-expression of the capabilities of the reference
streaming-ingestion pipeline (SDU-SE-Big-Data-E24/ingest, studied at
/root/reference) as idiomatic Spark DataFrame / SQL / Structured
Streaming code, extended with the LLM-data-pipeline operator family
(dedup, similarity search, multimodal columns, text analysis) and
designed for 100 TB scale.

Layout:
    session    — SparkSession factory with scale-oriented defaults
    catalog    — test-table loading / temp-view registration
    schemas/   — Avro-contract <-> StructType tooling + the 4 contracts
    functions/ — column-level helpers (hashing, vectors, text)
    operators/ — DataFrame -> DataFrame operators (dedup, flatten, ...)
    sources/   — batch/micro-batch source wrappers (REST, JSONSTAT, JDBC)
    streaming/ — Structured Streaming pipelines (ingest->clean->dedup->sink)
"""

__version__ = "0.1.0"

from ingest_spark.session import get_spark  # noqa: F401
