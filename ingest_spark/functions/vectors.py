"""Vector math over ``array<float|double>`` columns, JVM-side.

Embedding similarity (extension E3) without leaving whole-stage
codegen: higher-order functions (``zip_with`` + ``aggregate``) compute
dot products and norms as Catalyst expressions, so a brute-force
top-k over 100 TB of embeddings is a plain shuffle-free map followed
by a windowed rank — no Python in the hot path.

All arithmetic is forced to double: the source arrays are float32 and
summing in float32 is both lossy and engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-order double-precision dot product of two arrays."""
    zipped = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(zipped, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) in double precision; NULL if either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
