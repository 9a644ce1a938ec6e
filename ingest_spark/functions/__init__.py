from ingest_spark.functions.hashing import (  # noqa: F401
    content_hash,
    normalized_fingerprint,
    stable_hash64,
)
from ingest_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
