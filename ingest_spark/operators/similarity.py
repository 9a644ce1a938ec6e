"""Similarity search over embedding columns (extension E3).

Two tiers, same API:

- ``brute_force_topk``: exact cosine top-k. Plan: broadcast the (small)
  query set against the corpus -> narrow map computing cosine in
  codegen -> per-query window rank. No corpus shuffle; scales to any
  corpus size, linear in |corpus| * |queries|.
- ``lsh_topk``: random-hyperplane (sign) LSH. Deterministic hyperplanes
  derived from SHA-256 so signatures are reproducible. Bucket on the
  signature prefix, search only bucket-mates (optionally multi-probe by
  also checking Hamming-adjacent buckets). At 100 TB this turns the
  cross product into a bucketed equi-join — the classic IVF/LSH trade:
  recall for a ~bands/2^bits fraction of the work.

Ties are broken on neighbor id so results are oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ingest_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine_sim, rank).

    ``queries`` is broadcast — top-k search is almost always
    few-queries-vs-huge-corpus, so the corpus never shuffles until the
    final per-query rank (tiny: k rows per query after pushdown of the
    window via rank filter).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim", F.round(cosine_similarity("__qvec", "__cvec"), round_to)
        )
        .drop("__qvec", "__cvec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_planes(num_bits: int = 16, dim: int = 64, seed: int = 11) -> list[list[float]]:
    """Deterministic +/-1 hyperplanes from a fixed LCG stream — shared
    by the Column builder below and the SQL-oracle generator, so both
    engines bucket with literally the same planes."""
    state = seed
    planes = []
    for _ in range(num_bits):
        plane = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            plane.append(1.0 if (state >> 16) & 1 else -1.0)
        planes.append(plane)
    return planes


def hyperplane_signature(vec_col: str, num_bits: int = 16, dim: int = 64, seed: int = 11):
    """Deterministic sign-LSH signature: bit_j = sign(v . h_j); no RNG
    at runtime, reproducible across engines (dot products are
    sequential double sums in both)."""
    bits = []
    for j, plane in enumerate(hyperplane_planes(num_bits, dim, seed)):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(p) for p in plane]),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_bits: int = 12,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, re-ranked by
    exact cosine. Equi-join on the bucket replaces the cross product."""
    sig = lambda df, name: df.select(  # noqa: E731
        F.col(id_col).alias(name),
        F.col(vec_col).alias(f"__{name}_vec"),
        hyperplane_signature(vec_col, num_bits, dim).alias("__bucket"),
    )
    c, q = sig(corpus, "neighbor_id"), sig(queries, "query_id")
    scored = (
        c.join(F.broadcast(q), on="__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine_similarity("__query_id_vec", "__neighbor_id_vec"), round_to),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t).
    Exact all-pairs — the sf-test oracle; at scale run lsh_topk per
    item instead (same scoring expression)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    cos = cosine_similarity("__va", "__vb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        # filter on the UNROUNDED value (boundary-stable vs the oracle),
        # round only the reported column
        .filter(cos >= threshold)
        .withColumn("cosine_sim", F.round(cos, round_to))
        .select("id_a", "id_b", "cosine_sim")
    )
