"""Mergeable frequency sketches (E9 family).

Misra-Gries heavy hitters as a distributed, MERGEABLE summary
(Agarwal et al., "Mergeable Summaries", PODS'12): each partition
builds a k-counter MG summary in one pass (Arrow-batched, pure
Python over grouped counts), partials are unioned by a plain hash
aggregate, and the final merge subtracts the (k+1)-th largest
combined count — preserving the MG guarantee that every item with
true frequency > n/(k+1) survives and each surviving estimate
undercounts by at most n/(k+1).

Why not exact groupBy-count? At 100 TB a full term histogram's
shuffle carries every distinct item (billions of keys); the MG
partial carries AT MOST k rows per partition regardless of input
size — the same partial-vs-exact trade `sketch_rollup_union` makes
for distinct counts, applied to top-k frequency.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_summarize(counts: dict[str, int], k: int) -> dict[str, int]:
    """Compress a counter dict to <= k entries, MG-style: repeatedly
    subtract the smallest surviving count from all (implemented as a
    single threshold pass: keep the k largest, subtract the (k+1)-th
    largest value)."""
    if len(counts) <= k:
        return dict(counts)
    by_count = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    threshold = by_count[k][1]
    return {
        item: c - threshold for item, c in by_count[:k] if c - threshold > 0
    }


def heavy_hitters(
    df: DataFrame, item_col: str, k: int = 64
) -> DataFrame:
    """-> (item, est_count): items that MAY have frequency > n/(k+1),
    with lower-bound estimates (est <= true <= est + n/(k+1)).

    Stage 1 (mapInPandas): per Arrow batch, value_counts -> MG
    compress to k counters — emits <= k rows per batch, so the shuffle
    after it is bounded by partitions x k, never by cardinality.
    Stage 2: hash-aggregate the partials (associative counter union).
    Stage 3: one more MG compression at the merged level — the
    PODS'12 merge rule — done with window-free DataFrame ops (the
    (k+1)-th largest value is a 1-row broadcast).
    """
    out_schema = T.StructType(
        [
            T.StructField("item", T.StringType()),
            T.StructField("c", T.LongType()),
        ]
    )

    def _partials(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            vc = pdf[item_col].dropna().astype(str).value_counts()
            mg = _mg_summarize(vc.to_dict(), k)
            if mg:
                yield pd.DataFrame(
                    {"item": list(mg.keys()), "c": list(mg.values())}
                )

    partials = df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        _partials, out_schema
    )
    combined = partials.groupBy("item").agg(F.sum("c").alias("c"))
    # (k+1)-th largest combined count = the merge-step subtraction;
    # TakeOrderedAndProject keeps this a per-partition-heap head, and
    # the 1-row threshold frame broadcasts onto the combined counters
    kth = (
        combined.orderBy(F.col("c").desc(), "item")
        .limit(k + 1)
        .agg(
            F.when(F.count(F.lit(1)) > k, F.min("c"))
            .otherwise(F.lit(0))
            .alias("thr")
        )
    )
    return (
        combined.crossJoin(F.broadcast(kth))
        .select("item", (F.col("c") - F.col("thr")).alias("est_count"))
        .filter(F.col("est_count") > 0)
    )
