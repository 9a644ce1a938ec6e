"""r16 doubling-ladder materialization A/B (VERDICT r15 §Next #5).

Variants of dup_gram_doubling_profile's level loop (levels=4, rungs
L, 2L, 4L, 8L; level-0 dup always pinned):

- pinned:  r15 shape — pin every intermediate level (dup2, dup4).
- nopin:   no intermediate pins — each level's join+filter subtree
           re-executes for both self-join sides of the next level and
           its hit frame (3x), but over the PINNED level-0 blocks.
- fused4:  pin only every other level: dup2 is built UNPINNED and used
           only for its hit frame; dup4's candidates come from a 4-way
           self-join of the pinned level-0 dup (positions p, p+L,
           p+2L, p+3L with the nested quadruple key); dup8 from dup4
           (pinned). Exact: a position holds a duplicated quadruple
           key iff all four L-parts are duplicated, so pruning by
           level-0 flags never drops a counted occurrence.

All variants must produce the identical per-doc profile (asserted).

Usage: SPARK_GRAFT_SF_DIR=... python tools/dup_doubling_fuse_ab.py [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ingest_spark.catalog import load_table
from ingest_spark.operators.dedup import hash128
from ingest_spark.operators.text import word_ngrams_fast
from ingest_spark.pinning import pin
from ingest_spark.session import get_spark  # noqa: E402

BASE_L = 10
LEVELS = 4


def _grams(df: DataFrame) -> DataFrame:
    words = F.split("text", " ")
    has_gap = F.array_contains(words, "")
    fast = (
        df.filter(~has_gap)
        .select(
            F.col("doc_id"),
            F.posexplode(word_ngrams_fast("text", BASE_L)).alias("pos0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            hash128(F.col("gram")).alias("h"),
        )
    )
    slow_grams = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - (BASE_L - 1), F.lit(0))),
            lambda i: F.struct(
                i.alias("pos"),
                F.when(
                    ~F.exists(F.slice(words, i, BASE_L), lambda w: w == ""),
                    F.array_join(F.slice(words, i, BASE_L), " "),
                ).alias("gram"),
            ),
        ),
        lambda s: s["gram"].isNotNull(),
    )
    slow = (
        df.filter(has_gap)
        .select(F.col("doc_id"), F.explode(slow_grams).alias("g"))
        .select(
            "doc_id",
            F.col("g.pos").cast("long").alias("pos"),
            hash128(F.col("g.gram")).alias("h"),
        )
    )
    return fast.unionByName(slow)


def _dup_only(cand: DataFrame) -> DataFrame:
    w = Window.partitionBy("h")
    return (
        cand.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") >= 2)
        .select("doc_id", "pos", "h")
    )


def _step(dup: DataFrame, span: int) -> DataFrame:
    a, b = dup.alias("a"), dup.alias("b")
    return a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") == F.col("a.pos") + span),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.pos").alias("pos"),
        F.struct(F.col("a.h").alias("lo"), F.col("b.h").alias("hi")).alias("h"),
    )


def _finish(df: DataFrame, hits: list[DataFrame]) -> DataFrame:
    lengths = hits[0]
    for extra in hits[1:]:
        lengths = lengths.unionByName(extra)
    prof = lengths.groupBy("doc_id").agg(F.max("dup_len").alias("max_dup_len"))
    return (
        df.select("doc_id")
        .join(prof, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("max_dup_len", F.lit(0).cast("long")).alias("max_dup_len"),
        )
    )


def _hit(dup: DataFrame, length: int) -> DataFrame:
    return dup.select("doc_id").withColumn(
        "dup_len", F.lit(length).cast("long")
    )


def variant_pinned(df: DataFrame) -> DataFrame:
    dup = pin(_dup_only(_grams(df)))
    hits = [_hit(dup, BASE_L)]
    span = BASE_L
    for lvl in range(LEVELS - 1):
        dup = _dup_only(_step(dup, span))
        if lvl < LEVELS - 2:
            dup = pin(dup)
        span *= 2
        hits.append(_hit(dup, span))
    return _finish(df, hits)


def variant_nopin(df: DataFrame) -> DataFrame:
    dup = pin(_dup_only(_grams(df)))
    hits = [_hit(dup, BASE_L)]
    span = BASE_L
    for _lvl in range(LEVELS - 1):
        dup = _dup_only(_step(dup, span))
        span *= 2
        hits.append(_hit(dup, span))
    return _finish(df, hits)


def variant_fused4(df: DataFrame) -> DataFrame:
    dup0 = pin(_dup_only(_grams(df)))
    hits = [_hit(dup0, BASE_L)]
    # 2L: unpinned, hit frame only
    dup2 = _dup_only(_step(dup0, BASE_L))
    hits.append(_hit(dup2, 2 * BASE_L))
    # 4L: 4-way self-join of dup0 (quadruple key nested as the same
    # struct-of-structs the 2-step path builds, so equality semantics
    # and the oracle's key shape are identical)
    a, b, c, d = (dup0.alias(x) for x in "abcd")
    L = BASE_L
    cand4 = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("b.pos") == F.col("a.pos") + L))
        .join(c, (F.col("a.doc_id") == F.col("c.doc_id")) & (F.col("c.pos") == F.col("a.pos") + 2 * L))
        .join(d, (F.col("a.doc_id") == F.col("d.doc_id")) & (F.col("d.pos") == F.col("a.pos") + 3 * L))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.pos").alias("pos"),
            F.struct(
                F.struct(F.col("a.h").alias("lo"), F.col("b.h").alias("hi")).alias("lo"),
                F.struct(F.col("c.h").alias("lo"), F.col("d.h").alias("hi")).alias("hi"),
            ).alias("h"),
        )
    )
    dup4 = pin(_dup_only(cand4))
    hits.append(_hit(dup4, 4 * BASE_L))
    # 8L from dup4, unpinned (hit only — last rung)
    dup8 = _dup_only(_step(dup4, 4 * BASE_L))
    hits.append(_hit(dup8, 8 * BASE_L))
    return _finish(df, hits)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dup-doubling-fuse-ab")
    sc = spark.sparkContext
    docs = load_table(spark, sf_dir, "documents")

    variants = {
        "pinned": variant_pinned,
        "nopin": variant_nopin,
        "fused4": variant_fused4,
    }
    want = None
    for vname, fn in variants.items():
        got = {(r.doc_id, r.max_dup_len) for r in fn(docs).collect()}
        if want is None:
            want = got
        assert got == want, f"{vname} diverges"
    times = {v: [] for v in variants}
    jobs = {}
    for t in range(args.trials):
        for vname, fn in variants.items():
            g = f"{vname}-{t}"
            sc.setJobGroup(g, vname)
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            times[vname].append(round(time.perf_counter() - t0, 3))
            jobs[vname] = len(sc.statusTracker().getJobIdsForGroup(g))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": docs.count(),
                **{f"{v}_min": min(times[v]) for v in variants},
                **{f"{v}_jobs": jobs[v] for v in variants},
                **times,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
