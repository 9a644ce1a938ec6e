from ingest_spark.schemas.avsc import (  # noqa: F401
    avsc_to_struct,
    normalize_avsc,
    struct_to_avsc,
)
from ingest_spark.schemas.contracts import CONTRACTS, contract_schema  # noqa: F401
