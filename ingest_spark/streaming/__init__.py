from ingest_spark.streaming.pipeline import (  # noqa: F401
    ingest_transform,
    read_file_stream,
    run_ingest_pipeline,
    write_stream_parquet,
)
