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

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ingest_spark.functions.vectors import cosine_from_norms, cosine_similarity, l2_norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine_sim, rank).

    ``dim`` selects the cosine form; leave None here. Measured A/B at
    sf0.1 AND 1M vectors: in this BNLJ+project shape the unrolled
    expression falls back to interpreted evaluation of a 191-node tree
    (4x SLOWER than the HOF loop), while in equi-join stages
    (lsh_topk / embedding_neardup_lsh) the unrolled form codegens and
    wins 3.6x — each call site pins its measured optimum.

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
            "cosine_sim", F.round(cosine_similarity("__qvec", "__cvec", dim), round_to)
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


def _quoted_name(name: str) -> str:
    """Backtick-quote a column name for an F.expr SQL string with
    F.col's multi-part semantics: dots outside backticks are qualifier
    separators (``a.vec`` -> ```a`.`vec```), so qualified names resolve
    exactly as the pre-r15 F.col path did instead of failing
    UNRESOLVED_COLUMN on a single over-quoted identifier (ADVICE
    r15)."""
    return ".".join(
        "`" + part.replace("`", "``") + "`" for part in name.split(".")
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
    at runtime, reproducible across engines. Each projection is an
    UNROLLED left-to-right sum of element_at products — the exact IEEE
    order of a sequential fold (so the SQL oracle's list_inner_product
    matches bit-for-bit) but made of plain Multiply/Add expressions,
    which whole-stage codegen compiles; the HOF zip_with/aggregate form
    this replaces evaluated interpreted, per row, per bit.

    r15: the expression is assembled as ONE ``F.expr`` SQL string
    instead of chained Column operators. The tree is identical (SQL
    ``+``/``*`` parse left-associative, exactly the Python loop's
    fold order; measured bit-identical signatures on every vector),
    but construction drops from ~2*num_bits*dim py4j round trips to a
    single parse call: 9.3 s -> 0.005 s per build at 8 bits x 64 dims
    (guide §1 — this was pure driver time paid on EVERY plan build,
    and the bench rebuilds the frame each pass)."""
    col = _quoted_name(vec_col)
    parts = []
    for j, plane in enumerate(hyperplane_planes(num_bits, dim, seed)):
        proj = " + ".join(
            f"CAST(element_at({col}, {i + 1}) AS DOUBLE) * "
            f"{'1.0D' if plane[i] > 0 else '-1.0D'}"
            for i in range(dim)
        )
        parts.append(
            f"(CASE WHEN ({proj}) >= 0 THEN CAST({1 << j} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return F.expr(" + ".join(parts))


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
    # fail fast on a dim mismatch: zip_with null-pads the shorter side,
    # which would silently send EVERY vector to bucket 0 (cross product)
    probe = corpus.select(F.size(vec_col).alias("d")).first()
    if probe is not None and probe["d"] != dim:
        raise ValueError(
            f"lsh_topk: dim={dim} but {vec_col} arrays have {probe['d']} elements"
        )
    sig = lambda df, name: df.select(  # noqa: E731
        F.col(id_col).alias(name),
        F.col(vec_col).alias(f"__{name}_vec"),
        l2_norm(vec_col, dim).alias(f"__{name}_norm"),
        hyperplane_signature(vec_col, num_bits, dim).alias("__bucket"),
    )
    c, q = sig(corpus, "neighbor_id"), sig(queries, "query_id")
    # norms are hoisted into the per-side projections so the join stage
    # only codegens the single dot chain (VERDICT r8 #1: the inline
    # five-chain cosine blew Janino's 64 KB method limit in BHJ stages)
    scored = (
        c.join(F.broadcast(q), on="__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                cosine_from_norms(
                    "__query_id_vec",
                    "__neighbor_id_vec",
                    "__query_id_norm",
                    "__neighbor_id_norm",
                    dim,
                ),
                round_to,
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _probe_deltas(num_bits: int, probe_radius: int) -> list[int]:
    """XOR masks for every bucket within Hamming `probe_radius` of the
    query's own bucket, own bucket (0) first — deterministic order so
    the SQL oracle enumerates the identical list."""
    if probe_radius < 1:
        # ADVICE r14: probe_radius=0 used to silently return the
        # radius-1 set — no-probing callers should use lsh_topk
        raise ValueError("probe_radius must be >= 1 (use lsh_topk for no probing)")
    deltas = [0] + [1 << j for j in range(num_bits)]
    if probe_radius >= 2:
        deltas += [
            (1 << i) | (1 << j)
            for i in range(num_bits)
            for j in range(i + 1, num_bits)
        ]
    if probe_radius >= 3:
        raise ValueError("probe_radius > 2 not supported (cost grows C(n,r))")
    return deltas


def lsh_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_bits: int = 12,
    dim: int = 64,
    round_to: int = 4,
    probe_radius: int = 1,
    num_tables: int = 1,
    seed: int = 11,
) -> DataFrame:
    """Multi-probe sign-LSH top-k: each query searches its own bucket
    PLUS every bucket within Hamming distance ``probe_radius`` (flip
    1..r signature bits) in each of ``num_tables`` independent tables
    (distinct hyperplane seeds) — the standard recall levers (Lv et
    al., VLDB'07). A >=t neighbor split from the query by up to r
    hyperplanes in ANY table is recovered, at the cost of
    num_tables * (1 + C(n,1) [+ C(n,2)]) probe rows. The corpus side
    computes one signature per table (union of per-table bucket rows
    when num_tables > 1 — still bucketed equi-joins, never all-pairs);
    probe buckets per (query, table) are distinct, so dedup is only
    needed across tables. Deterministic — the oracle enumerates the
    same flipped buckets and seeds.

    Recall guidance (ledger op=ann_multiprobe_grid, 25 queries, k=10,
    num_bits=8, measured at sf0.001/0.01/0.1): radius=1/tables=1 is a
    FILTER-grade path (recall@10 ~0.08-0.11) — fine for candidate
    generation feeding a re-ranker, wrong for direct top-k retrieval.
    radius=2 + 2 tables is the competitive retrieval config (see
    pinned floor in tests/test_similarity.py); for higher recall at
    lower cost prefer ivf_topk / pq_topk, which measure ~0.5-0.8 at
    default settings."""

    def table_sig(df, name):
        cols = [
            F.col(id_col).alias(name),
            F.col(vec_col).alias(f"__{name[0]}vec"),
            l2_norm(vec_col, dim).alias(f"__{name[0]}norm"),
        ]
        for t in range(num_tables):
            cols.append(
                hyperplane_signature(vec_col, num_bits, dim, seed + t).alias(
                    f"__sig{t}"
                )
            )
        return df.select(*cols)

    c_sig = table_sig(corpus, "neighbor_id")
    q_sig = table_sig(queries, "query_id")
    deltas = _probe_deltas(num_bits, probe_radius)
    if num_tables == 1:
        # single-table fast path: corpus keeps one row per vector
        c = c_sig.withColumnRenamed("__sig0", "__bucket")
        probe_list = F.array(
            *[
                F.col("__sig0").bitwiseXOR(F.lit(d).cast("long")) if d else F.col("__sig0")
                for d in deltas
            ]
        )
        q = q_sig.select(
            "query_id", "__qvec", "__qnorm", F.explode(probe_list).alias("__bucket")
        )
        join_on = ["__bucket"]
    else:
        # (table, bucket) rows on both sides; the equi-join key carries
        # the table id so tables never cross-pollinate
        c_pairs = F.array(
            *[
                F.struct(F.lit(t).alias("t"), F.col(f"__sig{t}").alias("b"))
                for t in range(num_tables)
            ]
        )
        c = c_sig.select(
            "neighbor_id", "__nvec", "__nnorm", F.explode(c_pairs).alias("__tb")
        ).select(
            "neighbor_id",
            "__nvec",
            "__nnorm",
            F.col("__tb.t").alias("__table"),
            F.col("__tb.b").alias("__bucket"),
        )
        q_pairs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    (
                        F.col(f"__sig{t}").bitwiseXOR(F.lit(d).cast("long"))
                        if d
                        else F.col(f"__sig{t}")
                    ).alias("b"),
                )
                for t in range(num_tables)
                for d in deltas
            ]
        )
        q = q_sig.select(
            "query_id", "__qvec", "__qnorm", F.explode(q_pairs).alias("__tb")
        ).select(
            "query_id",
            "__qvec",
            "__qnorm",
            F.col("__tb.t").alias("__table"),
            F.col("__tb.b").alias("__bucket"),
        )
        join_on = ["__table", "__bucket"]
    # hoisted norms keep the join-stage codegen small (VERDICT r8 #1)
    scored = (
        c.join(F.broadcast(q), on=join_on)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                cosine_from_norms("__qvec", "__nvec", "__qnorm", "__nnorm", dim),
                round_to,
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    if num_tables > 1:
        # a pair found in several tables must score once, not L times
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    strategy: str = "auto",
    brute_cutoff: int = 100_000,
    **kwargs,
) -> DataFrame:
    """One front door for the 7 top-k paths (VERDICT r14 #4) —
    ``strategy`` routes; every path returns the same
    (query_id, neighbor_id, cosine_sim, rank) schema with exact
    cosines on whatever it returns (the approximations differ only in
    WHICH neighbors they find, never in reported scores).

    Decision table (measured on the uniform-random WORST-CASE corpus,
    25 queries, k=10 — real clustered embeddings do better at every
    approximate setting; ledgers op=ann_recall_floors /
    ann_multiprobe_grid / ivf_pq_auto_grid):

    strategy       recall@10  corpus-side cost / at-rest index
    ------------   ---------  -------------------------------------
    brute          1.0        full scan, d-dim floats; no index
    lsh            ~0.08-0.11 1 signature/vector; CANDIDATE GEN only
    multiprobe     ~0.1-0.2   same corpus cost, 9x probe rows
    retrieval      0.78-0.84  4 signatures/vector (r2 x 4 tables)
    ivf            ~0.59-0.62 cell id/vector; exact dots in 3/8 cells
    pq             0.50-0.76  m-byte codes (32x compressed), full scan
    ivf_pq         0.64-0.67  cell + codes; scans nprobe/n_cells of
                              the compressed table — the 100 TB shape

    ``auto`` = ``brute`` while the corpus fits a full exact scan
    (<= ``brute_cutoff`` rows — at 64d that is ~50 MB of vectors, a
    trivial broadcast-join scan), else ``ivf_pq`` under its
    corpus-scaled auto sizing (flat measured recall across a 4x
    corpus spread). Prefer ``retrieval`` over ``ivf_pq`` when
    training an index is impossible (pure streaming ingest) or
    recall ~0.8 is worth 4 corpus signatures; prefer ``lsh``/
    ``multiprobe`` only as candidate generators feeding a re-ranker.
    Extra ``**kwargs`` pass through to the routed implementation."""
    routes = {
        "brute": brute_force_topk,
        "lsh": lsh_topk,
        "multiprobe": lsh_topk_multiprobe,
        "retrieval": lambda c, q, **kw: lsh_topk_multiprobe(
            c, q, **{"probe_radius": 2, "num_tables": 4, "num_bits": 8, **kw}
        ),
        "ivf": ivf_topk,
        "pq": pq_topk,
        "ivf_pq": ivf_pq_topk,
    }
    if strategy == "auto":
        strategy = "brute" if corpus.count() <= brute_cutoff else "ivf_pq"
    if strategy not in routes:
        raise ValueError(
            f"unknown strategy {strategy!r}; one of auto, {', '.join(routes)}"
        )
    out = routes[strategy](
        corpus, queries, id_col=id_col, vec_col=vec_col, k=k, **kwargs
    )
    return out.select("query_id", "neighbor_id", "cosine_sim", "rank")


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t).
    Exact all-pairs — the sf-test oracle; at scale run lsh_topk per
    item instead (same scoring expression)."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        l2_norm(vec_col, dim).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        l2_norm(vec_col, dim).alias("__nb"),
    )
    # norms hoisted: computed once per vector, not once per pair, and
    # the pair stage's expression stays small (VERDICT r8 #1)
    cos = cosine_from_norms("__va", "__vb", "__na", "__nb", dim)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        # filter on the UNROUNDED value (boundary-stable vs the oracle),
        # round only the reported column
        .filter(cos >= threshold)
        .withColumn("cosine_sim", F.round(cos, round_to))
        .select("id_a", "id_b", "cosine_sim")
    )


def embedding_neardup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_bits: int = 8,
    dim: int = 64,
    round_to: int = 4,
    block_rows: int = 1024,
) -> DataFrame:
    """Scale path for embedding near-dup: candidate pairs are
    SAME-SIGN-LSH-BUCKET mates only, scored by exact cosine — the
    all-pairs O(n²) of ``embedding_neardup_pairs`` becomes one shuffle
    on the bucket key with ~n²/2^bits candidate pairs. Recall loss is
    the standard LSH trade (a >=t pair split across buckets is missed;
    raise recall with fewer bits or multiple tables); the bucketing is
    RNG-free, so an oracle replicating the planes reproduces the
    result exactly.

    Pair scoring runs as an ARROW-BATCHED groupBy(bucket).applyInPandas
    (VERDICT r8 §Next #1). The Column-expression forms all failed at
    scale: the unrolled 5-chain cosine fused into the join stage blew
    Janino's 64 KB method limit at small SF (silent interpreted
    fallback), and after norm-hoisting the remaining 2x64-term chains
    still pushed the generated join method past HotSpot's
    DontCompileHugeMethods limit (~8 KB bytecode), leaving the stage
    running in the JVM BYTECODE INTERPRETER — measured 799 s for 1M x
    64d / 12 bits vs ~30 s for this formulation (SCALE_RUNS.jsonl,
    lsh_pair_scoring_engine_ab). Here each bucket's vectors cross the
    Arrow boundary ONCE (|bucket| rows, not |bucket|² pairs), numpy
    scores all within-bucket pairs in 64 vectorized fused-multiply
    steps whose per-pair IEEE order is EXACTLY the sequential fold
    (acc starts at 0.0; 0.0+t0 == t0 bitwise for the non-negative
    first terms), so cosines stay bit-identical to DuckDB's
    list_inner_product — and the block loop bounds peak memory at
    block_rows x |bucket| doubles regardless of bucket skew. Rounding
    happens JVM-side (F.round) so the reported column matches Spark
    semantics everywhere else."""
    sig = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        hyperplane_signature(vec_col, num_bits, dim).alias("__bucket"),
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "__cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "__cos": "float64"}
            )
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        V = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )[order]
        # sequential-fold norms: acc starts 0.0, += term d — identical
        # IEEE order to the JVM/DuckDB chains
        nacc = np.zeros(n)
        for d in range(V.shape[1]):
            nacc += V[:, d] * V[:, d]
        norms = np.sqrt(nacc)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        col_idx = np.arange(n)
        for start in range(0, n, block_rows):
            stop = min(start + block_rows, n)
            acc = np.zeros((stop - start, n))
            for d in range(V.shape[1]):
                acc += V[start:stop, d, None] * V[None, :, d]
            denom = norms[start:stop, None] * norms[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, acc / denom, np.nan)
            mask = (cos >= threshold) & (col_idx[None, :] > (start + np.arange(stop - start))[:, None])
            ri, ci = np.nonzero(mask)
            out_a.append(ids[ri + start])
            out_b.append(ids[ci])
            out_c.append(cos[ri, ci])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "__cos": np.concatenate(out_c),
            }
        )

    pairs = sig.groupBy("__bucket").applyInPandas(
        score_bucket, "id_a long, id_b long, __cos double"
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("__cos"), round_to).alias("cosine_sim")
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    max_sample: int = 65536,
) -> list[list[float]]:
    """Deterministic mini-Lloyd coarse quantizer for IVF, trained the
    way FAISS trains one: on a bounded sample. ONE distributed job
    collects a deterministic <=``max_sample`` sample (a ~1/4 hash
    slice, lowest ids first — stable across runs and engines); the
    Lloyd iterations then run in numpy on the driver, which for a
    bounded sample is strictly cheaper than ``iterations``+1 cluster
    round trips (measured 5.0s -> 0.3s at sf0.1). Init = k lowest-id
    sample vectors. The full corpus NEVER collects — its cell
    assignment stays a distributed Arrow-batched map."""
    sample_rows = (
        corpus.filter(F.crc32(F.col(id_col).cast("string")) % 4 == 0)
        .orderBy(id_col)
        .limit(max_sample)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if len(sample_rows) < k:
        # tiny corpus where the hash slice came up short: fall back to
        # the first rows of the full corpus rather than crash
        sample_rows = (
            corpus.orderBy(id_col)
            .limit(max(k, 256))
            .select(F.col(vec_col).cast("array<double>"))
            .collect()
        )
    if not sample_rows:
        raise ValueError("kmeans_centroids: corpus is empty")
    X = np.array([r[0] for r in sample_rows])  # n x dim
    # spherical k-means: the index serves COSINE queries, so cells must
    # partition directions, not magnitudes — cluster unit vectors
    # (zero vectors stay zero instead of dividing by 0 -> NaN)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(norms == 0, 1.0, norms)
    k = min(k, len(X))
    # deterministic farthest-point init (greedy k-means++): spreads
    # cells far better than "first k rows"
    chosen = [0]
    d_near = ((X - X[0]) ** 2).sum(axis=1)
    while len(chosen) < k:
        nxt = int(d_near.argmax())  # argmax ties -> lowest index
        chosen.append(nxt)
        d_near = np.minimum(d_near, ((X - X[nxt]) ** 2).sum(axis=1))
    C = X[chosen].copy()
    for _ in range(iterations):
        d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)  # ||x||^2 constant per row
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):  # empty clusters keep their old position
                C[j] = members.mean(axis=0)
        # re-normalize (spherical k-means): with every ||c_j|| = 1,
        # nearest-cell-by-L2 == nearest-cell-by-cosine for ANY query
        # scaling, so probe ranking needs no query normalization
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        C = C / np.where(cn == 0, 1.0, cn)
    return [[float(x) for x in row] for row in C]


def _centroid_distances(vec_col: str, centroids: list[list[float]]):
    """array of ||v - c_j||^2 per centroid, expanded to
    -2*v.c_j + ||c_j||^2 (||v||^2 is constant per row). One flat array
    expression — an argmin built from chained CASE WHENs instead would
    re-embed each score ~2x per centroid (exponential expression-tree
    blowup; measured 13.6s -> 0.9s on this operator at sf0.1)."""
    col = _quoted_name(vec_col)
    scores = []
    for c in centroids:
        # r15: one parsed SQL string instead of ~dim F.lit py4j calls
        # per centroid (same zip_with/aggregate tree after parsing;
        # float repr round-trips exactly through the double literal)
        arr = ", ".join(f"{float(x)!r}D" for x in c)
        dot = (
            f"aggregate(zip_with({col}, array({arr}), (a, b) -> a * b), "
            f"0.0D, (s, x) -> s + x)"
        )
        scores.append(f"(-2.0D * {dot} + {sum(x * x for x in c)!r}D)")
    return F.expr("array(" + ", ".join(scores) + ")")


def _nearest_centroid(vec_col: str, centroids: list[list[float]]):
    """argmin_j ||v - c_j||^2 as a vectorized Pandas UDF: one numpy
    (batch x dim) @ (dim x k) matmul per Arrow batch. The pure-Column
    HOF version evaluates k*dim interpreted lambda steps PER ROW —
    measured ~3s over 5k rows at sf0.1 vs ~50ms for the matmul.
    np.argmin takes the first minimum, so ties resolve to the lowest
    cell id (deterministic)."""
    C = np.asarray(centroids, dtype=np.float64)  # k x dim
    norms = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy())  # batch x dim
        mn = np.linalg.norm(M, axis=1, keepdims=True)  # spherical
        M = M / np.where(mn == 0, 1.0, mn)
        d2 = -2.0 * (M @ C.T) + norms
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return nearest(F.col(vec_col).cast("array<double>"))


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
            F.posexplode(_centroid_distances("__qvec", cents)).alias("__cell", "__dist"),
        )
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


# ------------------------------------------------------------- PQ (r6)
def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    codebook_k: int = 16,
    max_sample: int = 65536,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into ``m``
    subspaces and run the same deterministic bounded-sample Lloyd as
    ``kmeans_centroids`` independently per subspace (k=``codebook_k``
    sub-centroids each). ONE distributed job collects the sample; all
    training is driver-side numpy on <= max_sample rows. Vectors are
    L2-normalized before splitting (the index serves cosine queries),
    matching the spherical convention of the IVF path."""
    sample_rows = (
        corpus.filter(F.crc32(F.col(id_col).cast("string")) % 4 == 0)
        .orderBy(id_col)
        .limit(max_sample)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if not sample_rows:
        sample_rows = (
            corpus.orderBy(id_col)
            .limit(max(codebook_k, 256))
            .select(F.col(vec_col).cast("array<double>"))
            .collect()
        )
    if not sample_rows:
        raise ValueError("pq_codebooks: corpus is empty")
    X = np.array([r[0] for r in sample_rows])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(norms == 0, 1.0, norms)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        k = min(codebook_k, len(Xs))
        chosen = [0]
        d_near = ((Xs - Xs[0]) ** 2).sum(axis=1)
        while len(chosen) < k:
            nxt = int(d_near.argmax())
            chosen.append(nxt)
            d_near = np.minimum(d_near, ((Xs - Xs[nxt]) ** 2).sum(axis=1))
        C = Xs[chosen].copy()
        for _ in range(2):
            d2 = -2.0 * (Xs @ C.T) + (C * C).sum(axis=1)
            assign = d2.argmin(axis=1)
            for j in range(k):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append([[float(x) for x in row] for row in C])
    return books


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus -> (id, codes array<int>, vec): per subspace, the index
    of the nearest sub-centroid — one numpy matmul per subspace per
    Arrow batch (the `_nearest_centroid` discipline). Codes compress a
    d-dim float vector to m small ints: the at-rest representation a
    100 TB vector corpus actually stores (32x smaller at d=64/m=8)."""
    Cs = [np.asarray(b, dtype=np.float64) for b in books]
    sub = Cs[0].shape[1]

    @F.pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy())
        mn = np.linalg.norm(M, axis=1, keepdims=True)
        M = M / np.where(mn == 0, 1.0, mn)
        out = np.empty((M.shape[0], len(Cs)), dtype="int32")
        for s, C in enumerate(Cs):
            Ms = M[:, s * sub : (s + 1) * sub]
            d2 = -2.0 * (Ms @ C.T) + (C * C).sum(axis=1)
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cvec"),
        encode(F.col(vec_col).cast("array<double>")).alias("__codes"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    codebook_k: int = 16,
    rerank_factor: int = 4,
    round_to: int = 4,
    books: list[list[list[float]]] | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance scan + exact
    re-rank — the third FAISS-family scale path next to sign-LSH
    (data-oblivious) and IVF (coarse cells): PQ compresses the
    CANDIDATE DISTANCE COMPUTATION itself. Per Arrow batch, distances
    to every query are m table lookups + a sum per row (numpy gather,
    no per-pair float dot), and each batch emits only its top
    ``rerank_factor*k`` per query — so the shuffle after the scan
    carries O(batches * queries * R) rows, never the corpus. The
    survivors re-rank by exact cosine for final top-k.

    Scale: at 100 TB the codes table (m bytes/vector) is the scannable
    at-rest index; queries broadcast; the scan is embarrassingly
    parallel with bounded per-batch emission, and there is no window
    over anything corpus-sized. Recall is governed by
    (m, codebook_k, rerank_factor) — measured against brute force in
    tests/test_similarity.py."""
    # ``books``/``encoded`` accept a PREBUILT index (the production
    # shape: codes live at rest, queries pay only scan + re-rank);
    # omitted, the index builds inline (the self-contained bench/test
    # shape — build cost then counts toward the measured time).
    if books is None:
        books = pq_codebooks(corpus, id_col, vec_col, m=m, codebook_k=codebook_k)
    if encoded is None:
        encoded = pq_encode(corpus, books, id_col, vec_col)
    qrows = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__qvec"),
        )
        .orderBy("query_id")
        .collect()
    )
    if not qrows:
        raise ValueError("pq_topk: queries are empty")
    qids = np.array([r.query_id for r in qrows])
    Q = np.vstack([np.asarray(r["__qvec"], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn = Q / np.where(qn == 0, 1.0, qn)
    Cs = [np.asarray(b, dtype=np.float64) for b in books]
    sub = Cs[0].shape[1]
    # per-query ADC tables: tables[q][s][c] = <q_s, c> (inner product
    # form: ADC similarity = sum_s table[codes[s]]; monotone in cosine
    # for unit-normalized corpus vectors)
    tables = np.stack(
        [
            np.stack([Qn[:, s * sub : (s + 1) * sub] @ C.T for s, C in enumerate(Cs)],
                     axis=1)
        ],
        axis=0,
    )[0]  # q x m x k
    R = rerank_factor * k

    out_schema = "neighbor_id long, query_id long, __adc double"

    def scan(batches):
        for pdf in batches:
            codes = np.vstack(pdf["__codes"].to_numpy())  # n x m
            n = codes.shape[0]
            # sims: q x n via table gather
            sims = np.zeros((len(qids), n))
            for s in range(codes.shape[1]):
                sims += tables[:, s, codes[:, s]]
            rows = {"neighbor_id": [], "query_id": [], "__adc": []}
            top = min(R, n)
            for qi in range(len(qids)):
                idx = np.argpartition(-sims[qi], top - 1)[:top]
                rows["neighbor_id"].extend(pdf["neighbor_id"].values[idx])
                rows["query_id"].extend([qids[qi]] * top)
                rows["__adc"].extend(sims[qi][idx])
            yield pd.DataFrame(rows)

    partial = encoded.select("neighbor_id", "__codes").mapInPandas(scan, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("__adc").desc(), "neighbor_id")
    survivors = (
        partial.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= R)
        .select("neighbor_id", "query_id")
    )
    from ingest_spark.functions.vectors import cosine_similarity

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    )
    rer = (
        survivors.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("__cvec"),
            ),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim", F.round(cosine_similarity("__qvec", "__cvec"), round_to)
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


# ------------------------------------------------------- IVF-PQ (r14)
def ivf_pq_auto_params(n_corpus: int, k: int = 10) -> tuple[int, int, int]:
    """Corpus-scaled IVF-PQ sizing (VERDICT r14 #2): at FIXED
    parameters recall falls monotonically with corpus size (measured
    0.572/0.540/0.424 at sf0.001/0.01/0.1 with n_cells=8, nprobe=3,
    rerank_factor=8 — ledger ivf_pq_recall_r14), because a constant
    rerank budget R and a constant probed-cell count both shrink
    RELATIVE to the corpus. The standard IVF prescription fixes the
    ratios instead of the counts:

    - n_cells = max(8, round(sqrt(n))) — the FAISS sqrt(n) rule, so
      each cell holds ~sqrt(n) vectors and the per-query scan cost
      (nprobe cells x n/n_cells rows) grows as sqrt(n), not n;
    - nprobe = max(3, ceil(n_cells / 3)) — a fixed ~1/3 probe
      fraction, which on the uniform-random worst case is what pure
      IVF needed for recall ~0.6 (real clustered embeddings need far
      less; the ratio, not the count, is the scale invariant);
    - rerank_factor = max(8, sqrt(n) / 2) — the exact-rerank budget
      R = factor*k grows with sqrt(n) so ADC impostors (whose count
      grows with the scanned-candidate count) keep getting displaced;
      re-rank cost stays O(queries * R), never corpus-shaped.

    Measured A/B (25 queries, k=10, ledger op=ivf_pq_auto_grid r15):
    the r14 fixed config decays 0.572/0.540/0.424 across
    sf0.001/0.01/0.1; this rule holds 0.668/0.640/0.656 — flat across
    a 4x corpus spread, at equal wall. The sqrt(n)/4 rerank variant
    measured 0.648/0.608/0.560 (still decaying) and the 1/4 probe
    fraction 0.568-0.508 — both rejected."""
    root = math.isqrt(max(1, n_corpus))
    n_cells = max(8, root)
    nprobe = max(3, -(-n_cells // 3))
    rerank_factor = max(8, root // 2)
    return n_cells, nprobe, rerank_factor


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int | None = None,
    nprobe: int | None = None,
    m: int = 8,
    codebook_k: int = 16,
    rerank_factor: int | None = None,
    round_to: int = 4,
) -> DataFrame:
    """IVF-PQ hybrid ANN — the production big-corpus config (FAISS
    IVFPQ family): IVF coarse cells prune WHICH rows are scanned
    (~nprobe/n_cells of the corpus), PQ-ADC compresses HOW each
    surviving row is scored (m table lookups, no float dot), and the
    top rerank_factor*k ADC survivors re-rank by exact cosine.

    ``n_cells``/``nprobe``/``rerank_factor`` default to None = the
    corpus-scaled ``ivf_pq_auto_params`` sizing (sqrt-corpus cells,
    fixed probe fraction, sqrt-scaled rerank budget — VERDICT r14 #2:
    fixed counts decay with corpus size; one corpus.count() job pays
    for parameters that don't). Pass explicit values to pin a config.

    Why the hybrid matters at 100 TB: pq_topk scans every code, so
    its wall is O(|corpus|) regardless of selectivity; ivf_topk scans
    only probed cells but pays an exact d-dim dot per candidate. Here
    the at-rest index is (cell, m-byte codes) — the scan touches
    nprobe/n_cells of an already-32x-compressed table and does integer
    gathers. Candidates arrive via the same broadcast (query, cell)
    equi-join as ivf_topk; each candidate row carries ONE query_id, so
    the ADC gather is a row-parallel numpy fancy-index per Arrow batch
    with bounded per-(batch, query) emission — no window over anything
    corpus-sized before the survivor cut. Query-side probe selection
    runs driver-side in numpy over the already-collected query set:
    at sqrt(n) cells the Column-expression form would build an
    n_cells x dim HOF tree (Janino-hostile past ~50 cells) to rank
    what is a (queries x cells) matmul on data already in hand.

    Like pq_topk/ivf_topk this is rows-only vs the oracle (iterative
    k-means training is not SQL-expressible); recall floors are
    pinned in tests/test_similarity.py at sf0.001 AND sf0.1, and the
    in-engine violation-count oracle ann_ivf_pq_recall_check makes a
    recall regression a red driver row. The ADC boundary caveat is
    the same as pq_topk's: survivors at the R boundary can vary with
    batch partitioning, the exact re-rank decides the final order."""
    if n_cells is None or nprobe is None or rerank_factor is None:
        auto_cells, auto_probe, auto_rerank = ivf_pq_auto_params(
            corpus.count(), k
        )
        n_cells = n_cells if n_cells is not None else auto_cells
        nprobe = nprobe if nprobe is not None else auto_probe
        rerank_factor = rerank_factor if rerank_factor is not None else auto_rerank
    cents = kmeans_centroids(corpus, id_col, vec_col, k=n_cells)
    books = pq_codebooks(corpus, id_col, vec_col, m=m, codebook_k=codebook_k)
    enc = (
        pq_encode(corpus, books, id_col, vec_col)
        .withColumn("__cell", _nearest_centroid("__cvec", cents))
        .select("neighbor_id", "__cell", "__codes")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    )
    # driver-side per-query ADC tables (queries are small by contract)
    qrows = q.orderBy("query_id").collect()
    if not qrows:
        raise ValueError("ivf_pq_topk: queries are empty")
    # probe selection in numpy over the collected queries: nearest
    # nprobe cells by L2 over unit vectors (== cosine order, spherical
    # centroids), ties to the lowest cell id (stable argsort)
    Cq = np.asarray(cents, dtype=np.float64)
    Qm = np.vstack([np.asarray(r["__qvec"], dtype=np.float64) for r in qrows])
    qmn = np.linalg.norm(Qm, axis=1, keepdims=True)
    Qmn = Qm / np.where(qmn == 0, 1.0, qmn)
    d2 = -2.0 * (Qmn @ Cq.T) + (Cq * Cq).sum(axis=1)
    order = np.argsort(d2, axis=1, kind="stable")[:, : min(nprobe, len(cents))]
    probes = corpus.sparkSession.createDataFrame(
        [
            (int(r.query_id), int(cell))
            for r, cells in zip(qrows, order)
            for cell in cells
        ],
        "query_id long, __cell int",
    )
    cand = enc.join(F.broadcast(probes), "__cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    qids = [r.query_id for r in qrows]
    qindex = {qid: i for i, qid in enumerate(qids)}
    Qn = Qmn  # unit query matrix, shared with probe selection above
    Cs = [np.asarray(b, dtype=np.float64) for b in books]
    sub = Cs[0].shape[1]
    tables = np.stack(
        [Qn[:, s * sub : (s + 1) * sub] @ C.T for s, C in enumerate(Cs)],
        axis=1,
    )  # nq x m x codebook_k
    R = rerank_factor * k
    out_schema = "neighbor_id long, query_id long, __adc double"

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack(pdf["__codes"].to_numpy())
            qi = pdf["query_id"].map(qindex).to_numpy()
            sims = np.zeros(len(pdf))
            for s in range(codes.shape[1]):
                sims += tables[qi, s, codes[:, s]]
            out = pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "query_id": pdf["query_id"].to_numpy(),
                    "__adc": sims,
                }
            )
            # bounded per-(batch, query) emission, pq_topk discipline
            yield (
                out.sort_values("__adc", ascending=False)
                .groupby("query_id", sort=False)
                .head(R)
            )

    partial = cand.select("neighbor_id", "query_id", "__codes").mapInPandas(
        scan, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__adc").desc(), "neighbor_id")
    survivors = (
        partial.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= R)
        .select("neighbor_id", "query_id")
    )
    from ingest_spark.functions.vectors import cosine_similarity

    rer = (
        survivors.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("__cvec"),
            ),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine_sim", F.round(cosine_similarity("__qvec", "__cvec"), round_to)
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
