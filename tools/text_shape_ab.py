"""Text-family heavyweight shape A/B (r12, VERDICT r11 §Next #5).

tools/text_plan_profile.py on the r11 registry shapes shows:

- ``tfidf_top_terms``: the tf subtree (scan -> explode -> partial agg
  -> exchange -> final agg) executes TWICE — once as the join probe,
  once under the dfreq aggregate. ReuseExchange does NOT fire because
  column pruning diverges the two subplans (the dfreq branch prunes
  the count expression), so the corpus is scanned + exploded +
  vocab-shuffled twice. Candidate: pin tf (doc-word grain — strictly
  smaller than token grain) and derive dfreq + probe from the pin.

- ``dsir_importance_weights``: THREE corpus scans/explodes (raw agg,
  tot-via-raw, token-grain probe), and at bench SF the planner
  broadcasts the TOKEN-GRAIN words side of the final join (BuildLeft
  over Generate->Scan) off a file-size misestimate — the exact shape
  that detonates at 100 TB. Candidate: restructure to tf grain — one
  explode into a pinned tf=(doc_id, lang, word, n); raw/tot/lw derive
  from a second pin at vocab grain; the per-doc score becomes
  sum(n * lw_micros), integer-exact-identical to the token-grain sum.
  One corpus scan total, and the probe side is a pinned frame with
  known stats, so the broadcast decision is made on real sizes.

Methodology (house rules): engine-only checksum sink, one untimed
warm-up per (query, variant), then N timed passes, min reported;
identical (n, crc) asserted across variants per query; one ledger
line per (query, variant).

Usage: python tools/text_shape_ab.py [sf_dir] [passes]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import bench
from ingest_spark import pinning
from ingest_spark.catalog import load_table
from ingest_spark.operators import relational
from ingest_spark.queries import QUERIES
from ingest_spark.session import get_spark
from tools import scale_runs

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = get_spark("text_shape_ab")


def tfidf_pinned(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    tf = pinning.pin(
        words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "word").withColumn(
        "tfidf", F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6)
    )
    return relational.top_n_per_group(
        scored.select("doc_id", "word", "tf", "tfidf"),
        ["doc_id"],
        [F.col("tfidf").desc(), F.col("word")],
        3,
    )


def dsir_tf_grain(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    )
    tf = pinning.pin(
        words.groupBy("doc_id", "lang", "word").agg(
            F.count(F.lit(1)).alias("__n")
        )
    )
    raw = pinning.pin(
        tf.groupBy("word").agg(
            F.sum("__n").alias("__cr"),
            F.sum(
                F.when(F.col("lang") == "en", F.col("__n")).otherwise(
                    F.lit(0)
                )
            ).alias("__ct"),
        )
    )
    tot = raw.agg(
        F.sum("__cr").alias("__tr"),
        F.count(F.lit(1)).alias("__v"),
        F.sum("__ct").alias("__tt"),
    )
    lw = raw.crossJoin(F.broadcast(tot)).select(
        "word",
        F.round(
            (
                F.log((F.col("__ct") + 1) / (F.col("__tt") + F.col("__v")))
                - F.log((F.col("__cr") + 1) / (F.col("__tr") + F.col("__v")))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("__lw"),
    )
    return (
        tf.join(lw, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("__n").alias("n_words"),
            F.sum(F.col("__n") * F.col("__lw")).alias("dsir_micros"),
        )
        .select(
            "doc_id",
            "n_words",
            "dsir_micros",
            F.expr("CAST(dsir_micros DIV n_words AS BIGINT)").alias(
                "avg_dsir_micros"
            ),
        )
    )


def dsir_raw_pinned(spark, sf_dir):
    """Narrow variant: keep the token-grain probe (explode is cheap;
    the sf10 A/B showed pinning the doc-word frame costs more than the
    scans it saves) but pin the VOCAB-grain raw aggregate so tot + lw
    derive from one aggregate instead of re-running the corpus
    explode + vocab shuffle, and so the final join's build-side
    decision is made on the pin's REAL stats instead of a token-grain
    file-size misestimate."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    )
    raw = pinning.pin(
        words.groupBy("word").agg(
            F.count(F.lit(1)).alias("__cr"),
            F.sum(
                F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
            ).alias("__ct"),
        )
    )
    tot = raw.agg(
        F.sum("__cr").alias("__tr"),
        F.count(F.lit(1)).alias("__v"),
        F.sum("__ct").alias("__tt"),
    )
    lw = raw.crossJoin(F.broadcast(tot)).select(
        "word",
        F.round(
            (
                F.log((F.col("__ct") + 1) / (F.col("__tt") + F.col("__v")))
                - F.log((F.col("__cr") + 1) / (F.col("__tr") + F.col("__v")))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("__lw"),
    )
    return (
        words.join(lw, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__lw").alias("dsir_micros"),
        )
        .select(
            "doc_id",
            "n_words",
            "dsir_micros",
            F.expr("CAST(dsir_micros DIV n_words AS BIGINT)").alias(
                "avg_dsir_micros"
            ),
        )
    )


CASES = [
    ("tfidf_top_terms", QUERIES["tfidf_top_terms"], tfidf_pinned, "tf_pinned"),
    (
        "dsir_importance_weights",
        QUERIES["dsir_importance_weights"],
        dsir_raw_pinned,
        "raw_pinned",
    ),
]


def run(fn):
    r = bench._checksum_sink(fn(spark, sf_dir))
    return (int(r["n"]), int(r["crc"]) if r["crc"] is not None else None)


for name, current, candidate, cand_label in CASES:
    results = {}
    for label, fn in [("current", current), (cand_label, candidate)]:
        run(fn)  # untimed warm-up (JIT/classload)
        walls = []
        for _ in range(passes):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            ck = run(fn)
            walls.append(round(time.perf_counter() - t0, 2))
        results[label] = (ck, min(walls), walls)
        print(f"{name} [{label}]: ck={ck} walls={walls}", flush=True)
    (ck_a, wall_a, _), (ck_b, wall_b, _) = (
        results["current"],
        results[cand_label],
    )
    assert ck_a == ck_b, f"{name}: checksum mismatch {ck_a} != {ck_b}"
    for label, (ck, wall, walls) in results.items():
        scale_runs.record(
            {
                "op": f"{name}_{label}",
                "params": {
                    "study": "text_shape_ab",
                    "sf_dir": sf_dir,
                    "passes": passes,
                },
                "wall_sec": wall,
                "checksum": list(ck),
                "agree": True,
            }
        )
    print(
        f"{name}: current={wall_a}s {cand_label}={wall_b}s "
        f"speedup={wall_a / wall_b:.2f}x",
        flush=True,
    )
