"""Two-stage seed-count A/B for exact_substring_spans (r14, VERDICT
r13 §Next #3 — the #1 attackable engine cost at sf10, 90.2 s
engine-only; the gram-scan lever measured parity in r13, so the lever
left is the seed JOIN stage).

Variants:
  bloom — the r12/r13 registry shape: hash128 computed for EVERY gram
          position on BOTH scans, full-corpus aggregate shuffles the
          16-byte struct key, pinned seed set, bloom-pruned probe,
          broadcast equi-join on gh.
  h64   — two-stage: stage 1 counts grams by a SINGLE xxhash64 (the
          full-corpus exchange carries an 8-byte key and the scans
          skip the second hash pass); stage 2 re-verifies the ~1%
          bloom survivors EXACTLY by windowed count over hash128(gram)
          — an h64 collision or bloom fp fabricates a survivor whose
          gh count is 1, so it is filtered; a true seed's gh count is
          its exact corpus count >= 2. Results provably identical
          (asserted per pass).

Regimes as in exact_substring_bloom_ab: default (seed set broadcasts)
and smj (autoBroadcastJoinThreshold=-1, the 100-TB posture).

Methodology (A/B discipline): engine-only checksum sink, one untimed
warm-up per variant, N timed passes, min reported, identical checksums
asserted across variants per regime. One ledger line per
(variant, regime, sf).

Usage: python tools/exact_substring_h64_ab.py [sf_dir] [passes]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F

import bench
from ingest_spark.catalog import load_table
from ingest_spark.operators import bloom, dedup, text
from ingest_spark.pinning import pin
from ingest_spark.queries import QUERIES
from ingest_spark.session import get_spark
from tools import scale_runs

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = get_spark("exact_substring_h64_ab")
L = 10


def variant_h64(spark, sf_dir):
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
        "gram",
        F.xxhash64("gram").alias("h64"),
    )
    freq64 = pin(
        pg.groupBy("h64")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("h64")
    )
    n_seeds = freq64.count()
    probe = bloom.bloom_prune(pg, freq64, F.col("h64"), "h64", n_seeds)
    surv = probe.select(
        "doc_id", "n_words", "pos", dedup.hash128("gram").alias("gh")
    )
    # exact stage: windowed count over the 128-bit key among survivors
    # (no join, no second pin; one survivor-sized exchange)
    wg = Window.partitionBy("gh")
    dup = (
        surv.withColumn("__n", F.count(F.lit(1)).over(wg))
        .filter(F.col("__n") >= 2)
        .drop("__n", "gh")
    )
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
    "bloom": QUERIES["exact_substring_spans"],
    "h64": variant_h64,
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
        assert checks["bloom"] == checks["h64"], (
            "variant results differ",
            regime,
            checks,
        )
        ratio = round(walls["bloom"] / walls["h64"], 3)
        for name in VARIANTS:
            scale_runs.record(
                {
                    "op": f"exact_substring_spans_{name}",
                    "params": {
                        "study": "exact_substring_h64_ab",
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
            f"[{regime}] bloom={walls['bloom']}s h64={walls['h64']}s "
            f"ratio={ratio}x checksum={checks['bloom']}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

spark.stop()
