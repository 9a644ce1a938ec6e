from ingest_spark.sources.rest import WindowedRestSource  # noqa: F401
from ingest_spark.sources.jsonstat import ingest_jsonstat  # noqa: F401
from ingest_spark.sources.jdbc import jdbc_reader  # noqa: F401
