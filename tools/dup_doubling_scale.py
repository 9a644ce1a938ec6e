"""Scale evidence for dup_gram_doubling_profile (VERDICT r14 §Next #8
adjudication — the suffix-array item, delivered as prefix doubling).

Measures the operator engine-only (checksum sink) at a given sf_dir
and records per-level candidate counts, proving the doubling rounds
shrink geometrically: level 0 pays the one unavoidable full-corpus
gram exchange; each later level exchanges only surviving candidates.

Usage: python tools/dup_doubling_scale.py [sf_dir] [passes]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from ingest_spark.catalog import load_table
from ingest_spark.operators.dedup import dup_gram_doubling_profile, hash128
from ingest_spark.pinning import pin
from ingest_spark.session import get_spark
from tools import scale_runs

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark("dup_doubling_scale")

docs = load_table(spark, sf_dir, "documents")

# per-level candidate volumes (the geometric-shrink claim, measured)
words = F.split("text", " ")
base_l = 10
grams = F.filter(
    F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (base_l - 1), F.lit(0))),
        lambda i: F.struct(
            i.alias("pos"),
            F.when(
                ~F.exists(F.slice(words, i, base_l), lambda w: w == ""),
                F.array_join(F.slice(words, i, base_l), " "),
            ).alias("gram"),
        ),
    ),
    lambda s: s["gram"].isNotNull(),
)
pg = docs.select(F.col("doc_id"), F.explode(grams).alias("g")).select(
    "doc_id", F.col("g.pos").cast("long").alias("pos"), hash128(F.col("g.gram")).alias("h")
)
level_counts = {"positions_l10": pg.count()}
dup = pin(
    pg.join(
        pg.groupBy("h").agg(F.count(F.lit(1)).alias("n")).filter("n >= 2").select("h"),
        "h",
    ).select("doc_id", "pos", "h")
)
span = base_l
level_counts[f"dup_l{span}"] = dup.count()
for _ in range(3):
    a, b = dup.alias("a"), dup.alias("b")
    cand = pin(
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + span),
        ).select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.pos").alias("pos"),
            F.struct(F.col("a.h").alias("lo"), F.col("b.h").alias("hi")).alias("h"),
        )
    )
    dup = pin(
        cand.join(
            cand.groupBy("h").agg(F.count(F.lit(1)).alias("n")).filter("n >= 2").select("h"),
            "h",
        ).select("doc_id", "pos", "h")
    )
    span *= 2
    level_counts[f"dup_l{span}"] = dup.count()

# timed end-to-end passes, checksum sink
def run_once():
    out = dup_gram_doubling_profile(docs, "doc_id", "text", base_l=10, levels=4)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("max_dup_len").alias("s"),
        F.sum(F.col("doc_id") * F.col("max_dup_len")).alias("x"),
    ).collect()[0]
    return (row.n, int(row.s), int(row.x))

chk = run_once()  # warm-up, untimed
walls = []
for _ in range(passes):
    t0 = time.time()
    c = run_once()
    walls.append(round(time.time() - t0, 3))
    assert c == chk, (c, chk)

entry = scale_runs.record(
    {
        "op": "dup_doubling_scale",
        "params": {"sf_dir": sf_dir, "passes": passes, "levels": [10, 20, 40, 80]},
        "wall_sec": min(walls),
        "checksum": {"n_s_x": list(chk), "walls": walls, "levels": level_counts},
    }
)
print(entry)
spark.stop()
