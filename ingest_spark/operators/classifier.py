"""Linear quality classifier over hashed features (extension E4/E7):
the fastText-style filter the CCNet/LLaMA-class curation pipelines
train to separate "reference-quality" text from crawl noise, built
Spark-first:

- FEATURES: the hashing trick (256 signed buckets over words — the
  same SHA-derived, engine-portable arithmetic as the 64-bucket
  ``feature_hash_vectors`` query), so there is no vocabulary to
  build, ship, or grow.
- LABELS: any boolean column the caller supplies (the shipped query
  uses the Gopher-style integer-micro quality gate — a weak-label
  bootstrap, exactly how production quality classifiers start).
- TRAINING: logistic regression by full-batch gradient descent on a
  BOUNDED deterministic sample (<= ``max_sample`` rows collected via
  the same hash-slice discipline as ``similarity.kmeans_centroids``)
  — driver-side numpy, fixed iterations/learning rate, zero RNG, so
  weights are reproducible bit-for-bit and the corpus never collects.
- SCORING: broadcast the N_BUCKETS+1 weights back over the sparse feature
  rows — one map-side-combined aggregate per doc, a narrow
  JVM-side plan at any corpus size.

Reference parity: none (the reference has no ML surface); this is
part of the mandated LLM-pipeline extension.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ingest_spark.functions.hashing import stable_hash64

N_BUCKETS = 256


def hashed_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sparse signed bag-of-words features: (id, bucket, weight != 0)
    rows, bucket = sha-hash(word) mod N_BUCKETS, sign from the next
    hash bit (collisions cancel in expectation). Same arithmetic as
    the oracle-checked ``feature_hash_vectors`` query."""
    words = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(text_col, " ")).alias("word"),
    ).filter(F.col("word") != "")
    h = stable_hash64("word", hex_digits=7)
    feats = words.select(
        "__id",
        (h % N_BUCKETS).alias("bucket"),
        F.when((h / N_BUCKETS).cast("long") % 2 == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    return (
        feats.groupBy("__id", "bucket")
        .agg(F.sum("sgn").alias("weight"))
        .filter(F.col("weight") != 0)
        .withColumnRenamed("__id", id_col)
    )


def _dense_matrix(rows, n_ids: dict) -> np.ndarray:
    X = np.zeros((len(n_ids), N_BUCKETS))
    for r in rows:
        X[n_ids[r["did"]], int(r["bucket"])] = float(r["weight"])
    return X


def train_logreg(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    iterations: int = 200,
    lr: float = 0.1,
    l2: float = 1e-3,
    max_sample: int = 65536,
) -> list[float]:
    """Returns N_BUCKETS+1 weights (bias last), trained by deterministic
    full-batch GD with L2, on a bounded hash-slice sample. Features
    are L2-row-normalized (hashed counts scale with doc length;
    normalization makes the margin length-invariant — the fastText
    convention)."""
    sample = (
        docs.select(
            F.col(id_col).alias("did"), F.col(label_col).cast("int").alias("y"),
            F.col(text_col).alias("text"),
        )
        .filter(F.crc32(F.col("did").cast("string")) % 4 == 0)
        .orderBy("did")
        .limit(max_sample)
    )
    labels = {r["did"]: r["y"] for r in sample.select("did", "y").collect()}
    if not labels:
        raise ValueError("train_logreg: empty training sample")
    feat_rows = hashed_features(
        sample.select(F.col("did").alias("doc_id"), "text"), "doc_id", "text"
    ).select(F.col("doc_id").alias("did"), "bucket", "weight").collect()
    ids = {d: i for i, d in enumerate(sorted(labels))}
    X = _dense_matrix(feat_rows, ids)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(norms == 0, 1.0, norms)
    y = np.array([labels[d] for d in sorted(labels)], dtype=np.float64)
    w = np.zeros(N_BUCKETS)
    b = 0.0
    n = len(y)
    for _ in range(iterations):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * ((X.T @ g) / n + l2 * w)
        b -= lr * (g.mean())
    return [float(v) for v in w] + [float(b)]


def train_centroid(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[float]:
    """Closed-form linear trainer (Rocchio 1971 / nearest-centroid
    direction): w_j = n_neg * S+_j - n_pos * S-_j, where S±_j are the
    per-class sums of hashed-feature weights — i.e. the (scaled)
    difference of class centroids, the one-shot trainer text
    classification has used since SMART. Unlike ``train_logreg`` this
    needs NO driver-side sample, no iterations, and no RNG: two
    distributed aggregates (one keyed by bucket, one global), a
    <=N_BUCKETS-row collect, done — the shape that holds at 100 TB.

    All arithmetic is INTEGER (feature weights are signed counts), so
    the returned weights are integer-valued floats and every engine
    reproduces them bit-for-bit while n_docs * corpus_word_count stays
    under 2^53 — which is what makes the registry query's DuckDB
    oracle exact (VERDICT r8 §Next #3). Bias is 0: the margin
    threshold lives with the caller. GD training (``train_logreg``)
    remains the iterative option, pinned by unit tests."""
    labeled = docs.select(
        F.col(id_col).alias("__did"),
        F.col(text_col).alias("__text"),
        F.col(label_col).cast("int").alias("__y"),
    )
    feats = hashed_features(
        labeled.select(F.col("__did").alias("doc_id"), F.col("__text").alias("text"))
    ).select(F.col("doc_id").alias("__did"), "bucket", "weight")
    cnt = labeled.agg(
        F.sum("__y").alias("n_pos"),
        F.sum(1 - F.col("__y")).alias("n_neg"),
    ).first()
    n_pos, n_neg = int(cnt["n_pos"] or 0), int(cnt["n_neg"] or 0)
    per_bucket = (
        feats.join(labeled.select("__did", "__y"), "__did")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__y") == 1, F.col("weight")).otherwise(0)).alias("s_pos"),
            F.sum(F.when(F.col("__y") == 0, F.col("weight")).otherwise(0)).alias("s_neg"),
        )
        .collect()
    )
    w = [0.0] * N_BUCKETS
    for r in per_bucket:
        w[int(r["bucket"])] = float(n_neg * int(r["s_pos"]) - n_pos * int(r["s_neg"]))
    return w + [0.0]


def score_docs(
    docs: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    emit_margin: bool = False,
) -> DataFrame:
    """Distributed scoring: sparse features x broadcast weights ->
    sigmoid probability + keep flag. The weight vector rides as 64
    literals inside one aggregate expression — scoring is a scan +
    one doc-keyed combine, no joins, no Python.

    Featureless docs (empty/whitespace text, or every hash bucket
    cancelled) carry NO signal: they report quality_prob 0.5 for
    transparency but are gated keep=False regardless of threshold —
    a curation filter must never pass documents it could not measure
    (ADVICE r6: the old coalesce-to-0.5 + `>= 0.5` default let
    zero-signal docs through by default).

    ``emit_margin=True`` outputs the raw normalized margin
    z = dot/||x|| + b instead of sigmoid(z): every op in z (+ * /
    sqrt) is IEEE-correctly-rounded, so with integer-valued weights
    the margin is BIT-IDENTICAL across engines — the oracle-exact
    projection — whereas exp() differs by libm. keep is then
    z >= logit(threshold) (z >= 0 at the 0.5 default), the same
    decision boundary without the exp."""
    if len(weights) != N_BUCKETS + 1:
        raise ValueError(f"expected {N_BUCKETS + 1} weights, got {len(weights)}")
    feats = hashed_features(docs, id_col, text_col)
    wlit = F.array(*[F.lit(float(v)) for v in weights[:N_BUCKETS]])
    contrib = F.element_at(wlit, (F.col("bucket") + 1).cast("int")) * F.col("weight")
    margins = feats.groupBy(id_col).agg(
        F.sum(contrib).alias("__dot"),
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("__norm"),
    )
    z = F.col("__dot") / F.col("__norm") + F.lit(float(weights[-1]))
    if emit_margin:
        import math

        logit = math.log(threshold / (1.0 - threshold))
        return (
            docs.select(id_col)
            .join(margins, id_col, "left")
            .select(
                id_col,
                F.coalesce(z, F.lit(0.0)).alias("margin"),
                F.coalesce(z >= F.lit(logit), F.lit(False)).alias("keep"),
            )
        )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        docs.select(id_col)
        .join(margins, id_col, "left")
        .select(
            id_col,
            F.coalesce(prob, F.lit(0.5)).alias("quality_prob"),
            F.coalesce(prob >= threshold, F.lit(False)).alias("keep"),
        )
    )
