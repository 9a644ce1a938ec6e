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


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
) -> list[list[float]]:
    """Deterministic mini-Lloyd coarse quantizer for IVF: init from the
    k lowest-id vectors, then ``iterations`` of assign-to-nearest /
    recompute-mean, all as DataFrame aggregates (posexplode ->
    per-(cluster,dim) avg). The returned centroid table is tiny
    (k x dim floats) — at any corpus scale it collects to the driver
    and broadcasts back as literals, so assignment is a narrow map
    with no shuffle on the corpus."""
    dim = len(corpus.select(vec_col).first()[0])
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("__v"))
    for _ in range(iterations):
        assigned = vecs.withColumn("__c", _nearest_centroid("__v", centroids))
        means = (
            assigned.select("__c", F.posexplode("__v").alias("__d", "__x"))
            .groupBy("__c", "__d")
            .agg(F.avg("__x").alias("__m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep old position
        acc: dict[int, list[float]] = {}
        for r in means:
            acc.setdefault(r["__c"], [0.0] * dim)[r["__d"]] = r["__m"]
        for c_idx, vals in acc.items():
            new[c_idx] = vals
        centroids = new
    return centroids


def _nearest_centroid(vec_col: str, centroids: list[list[float]]):
    """argmin_j ||v - c_j||^2 as a codegen expression: expand to
    -2*v.c_j + ||c_j||^2 (||v||^2 is constant per row)."""
    best_idx, best_score = F.lit(0), None
    for j, c in enumerate(centroids):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        norm = sum(x * x for x in c)
        score = -2.0 * dot + F.lit(norm)
        if best_score is None:
            best_idx, best_score = F.lit(j), score
        else:
            better = score < best_score
            best_idx = F.when(better, F.lit(j)).otherwise(best_idx)
            best_score = F.when(better, score).otherwise(best_score)
    return best_idx


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into
    ``n_cells`` Voronoi cells, probe the ``nprobe`` nearest cells per
    query, exact cosine re-rank within the probed cells. The
    scale-path sibling of ``lsh_topk`` with data-adapted partitions
    instead of data-oblivious hyperplanes: corpus assignment is a
    narrow map (centroids are literals), candidates arrive via a
    bucketed equi-join on cell id — ~nprobe/n_cells of the
    brute-force work."""
    cents = kmeans_centroids(corpus, id_col, vec_col, k=n_cells)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cvec"),
    ).withColumn("__cell", _nearest_centroid("__cvec", cents))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    )
    # nprobe nearest cells per query, as rows (query_id, cell)
    probes = (
        q.select(
            "query_id",
            "__qvec",
            F.posexplode(
                F.array(*[F.lit(j) for j in range(len(cents))])
            ).alias("__pos", "__cell"),
        )
        .withColumn("__dist", _centroid_distance("__qvec", cents))
        .withColumn(
            "__prank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("__dist", "__cell")
            ),
        )
        .filter(F.col("__prank") <= nprobe)
        .select("query_id", "__qvec", "__cell")
    )
    from ingest_spark.functions.vectors import cosine_similarity

    scored = (
        c.join(F.broadcast(probes), "__cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", F.round(cosine_similarity("__qvec", "__cvec"), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _centroid_distance(vec_col: str, centroids: list[list[float]]):
    """Distance from v to centroid[__cell] — branches on the literal
    cell index so the whole thing stays one codegen expression."""
    expr = F.lit(float("inf"))
    for j, cvals in enumerate(centroids):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in cvals]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        norm = sum(x * x for x in cvals)
        expr = F.when(F.col("__cell") == j, -2.0 * dot + F.lit(norm)).otherwise(expr)
    return expr
