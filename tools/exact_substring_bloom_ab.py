"""Bloom-pruned probe A/B for exact_substring_spans (r12, VERDICT r11
§Next #1 — the #1 engine cost at sf10, 146.5 s of a 978 s suite).

Variants:
  old    — the pre-r12 registry shape: seed aggregate + probe both
           re-derive the positional-gram frame inside one plan; the
           probe side flows UNPRUNED into the seed join.
  bloom  — the r12 registry shape: seed set pinned once
           (localCheckpoint of the small aggregate), broadcast Bloom
           filter over the seeds' h1 prunes probe grams BEFORE the
           join (operators/bloom.py; measured survival 0.4-1.2%).

Regimes:
  default — AQE as configured: the seed set broadcasts at bench SFs,
            so the probe side never shuffles and the bloom can only
            buy the BHJ probe's row-rate back.
  smj     — autoBroadcastJoinThreshold=-1: the 100-TB posture where a
            boilerplate-heavy corpus pushes the seed set past the
            broadcast threshold and the join degrades to sort-merge —
            the regime the bloom exists for (probe-side exchange
            carries only surviving grams).

Methodology (memory: A/B discipline): engine-only checksum sink
(bench._checksum_sink — no driver row delivery), one untimed warm-up
of each variant, then N timed passes each, min reported, identical
checksums asserted across variants per regime. One ledger line per
(variant, regime, sf).

Usage: python tools/exact_substring_bloom_ab.py [sf_dir] [passes]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F

import bench
from ingest_spark.catalog import load_table
from ingest_spark.operators import dedup, text
from ingest_spark.queries import QUERIES
from ingest_spark.session import get_spark
from tools import scale_runs

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = get_spark("exact_substring_bloom_ab")
L = 10


def variant_old(spark, sf_dir):
    """The pre-r12 shape, verbatim (git 32f34c5 queries.py:7153)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    pg = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.posexplode(text.word_ngrams_fast("text", L)).alias("pos0", "gram"),
    ).select(
        "doc_id",
        "n_words",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        dedup.hash128("gram").alias("gh"),
    )
    freq = pg.groupBy("gh").agg(F.count(F.lit(1)).alias("__n")).filter(
        F.col("__n") >= 2
    )
    dup = pg.join(freq.select("gh"), "gh")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(wd) <= L - 1, F.lit(0)
    ).otherwise(F.lit(1))
    islands = dup.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "n_words", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + L - 1).alias("span_end"),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
                "dup_words"
            ),
            F.expr(
                "CAST(sum(span_end - span_start + 1) * 10000 "
                "DIV any_value(n_words) AS BIGINT)"
            ).alias("dup_frac_c"),
        )
        .select(
            "doc_id",
            "n_spans",
            F.col("dup_words").cast("long").alias("dup_words"),
            "dup_frac_c",
        )
    )


VARIANTS = {
    "old": variant_old,
    "bloom": QUERIES["exact_substring_spans"],
}


def run(fn):
    r = bench._checksum_sink(fn(spark, sf_dir))
    return (int(r["n"]), int(r["crc"]) if r["crc"] is not None else None)


for regime, threshold in (("default", None), ("smj", "-1")):
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    if threshold is not None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    try:
        checks = {}
        walls = {}
        for name, fn in VARIANTS.items():
            checks[name] = run(fn)  # warm-up, also the checksum record
            t = []
            for _ in range(passes):
                t0 = time.perf_counter()
                c = run(fn)
                t.append(time.perf_counter() - t0)
                assert c == checks[name], (name, regime, c, checks[name])
            walls[name] = round(min(t), 2)
        assert checks["old"] == checks["bloom"], (
            "variant results differ",
            regime,
            checks,
        )
        ratio = round(walls["old"] / walls["bloom"], 3)
        for name in VARIANTS:
            scale_runs.record(
                {
                    "op": f"exact_substring_spans_{name}",
                    "params": {
                        "study": "exact_substring_bloom_ab",
                        "regime": regime,
                        "sf_dir": sf_dir,
                        "passes": passes,
                    },
                    "wall_sec": walls[name],
                    "checksum": list(checks[name]),
                    "agree": True,
                }
            )
        print(
            f"[{regime}] old={walls['old']}s bloom={walls['bloom']}s "
            f"ratio={ratio}x checksum={checks['old']}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

spark.stop()
