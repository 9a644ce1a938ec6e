from ingest_spark.operators import (  # noqa: F401
    classifier,
    dedup,
    flatten,
    graph,
    multimodal,
    relational,
    sampling,
    similarity,
    sketches,
    text,
    windows,
)
