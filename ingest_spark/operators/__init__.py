from ingest_spark.operators import (  # noqa: F401
    dedup,
    flatten,
    multimodal,
    relational,
    similarity,
    text,
    windows,
)
