"""r16 skew A/B for dup_gram_doubling_profile's ``_dup_only``
(VERDICT r15 §Next #2).

The r15 shape is a count window over the raw gram-hash key: one
exchange, but every position of one hot gram lands in a single task —
the §2.2 skew a boilerplate n-gram creates at 100 TB. Candidates:

- window:  count(*) over (partition by h) >= 2            (r15 shape)
- semi:    groupBy(h).count.filter(>=2) -> LEFT SEMI join back.
           The aggregate partial-combines map-side (the hot key
           collapses per task), the dup-key table is the join's small
           side (AQE broadcasts it when it fits, skew-splits the SMJ
           when it doesn't) — no stage ever holds one key's rows in
           one task.
- salted:  two-level window (salted_dup_flags shape): per-(h, salt)
           partial counts + representative election, then the exact
           total over reps+lights. Bounded tasks by construction,
           two exchanges.

Fixtures: ``uniform`` (every key appears exactly twice — the doubling
ladder's real regime where most candidates survive in pairs) and
``hot`` (~10% of all rows share ONE key, rest unique pairs).

Every variant must return the same row multiset (asserted via count +
hash-sum) — they compute the same ">= 2 corpus-wide" predicate.

Usage: python tools/dup_only_skew_ab.py [--rows 4000000] [--trials 3]
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

from ingest_spark.session import get_spark  # noqa: E402


def make_cand(spark, n_rows: int, hot_frac: float) -> DataFrame:
    """(doc_id, pos, h): hot_frac of rows share h=0, the rest pair up
    (ids 2k/2k+1 share a key) so the >=2 predicate keeps everything —
    the worst case for any shape (no early filtering)."""
    base = spark.range(n_rows).select(
        (F.col("id") % 1000).alias("doc_id"),
        (F.col("id") / 1000).cast("long").alias("pos"),
        F.when(
            (F.col("id") % F.lit(int(1 / hot_frac) if hot_frac > 0 else 1 << 62)) == 0,
            F.lit(0),
        )
        .otherwise((F.col("id") / 2).cast("long") + 1)
        .alias("h"),
    )
    return base.localCheckpoint()


def v_window(cand: DataFrame) -> DataFrame:
    w = Window.partitionBy("h")
    return (
        cand.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") >= 2)
        .select("doc_id", "pos", "h")
    )


def v_semi(cand: DataFrame) -> DataFrame:
    dup_keys = (
        cand.groupBy("h").agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("h")
    )
    return cand.join(dup_keys, "h", "semi").select("doc_id", "pos", "h")


def v_salted(cand: DataFrame, salt: int = 32, cap: int = 1024) -> DataFrame:
    base = cand.withColumn(
        "__salt", F.pmod(F.xxhash64("doc_id", "pos", F.lit(7)), F.lit(salt))
    )
    w1 = Window.partitionBy("h", "__salt")
    step1 = base.withColumn("__cp", F.count(F.lit(1)).over(w1)).withColumn(
        "__rn", F.row_number().over(w1.orderBy("doc_id", "pos"))
    )
    heavy = F.col("__cp") >= cap
    lvl2 = (
        step1.filter(~heavy | (F.col("__rn") == 1))
        .withColumn("__w", F.when(heavy, F.col("__cp")).otherwise(F.lit(1)))
        .withColumn("__tot", F.sum("__w").over(Window.partitionBy("h")))
    )
    light_dups = lvl2.filter(~heavy & (F.col("__tot") >= 2)).select(
        "doc_id", "pos", "h"
    )
    heavy_dups = step1.filter(heavy).select("doc_id", "pos", "h")
    return light_dups.unionByName(heavy_dups)


def fingerprint(df: DataFrame):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("doc_id", "pos", "h").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("s"),
    ).first()
    return int(r["n"]), str(r["s"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("dup-only-skew-ab")
    variants = {"window": v_window, "semi": v_semi, "salted": v_salted}

    for fixture, hot in (("uniform", 0.0), ("hot10pct", 0.10)):
        cand = make_cand(spark, args.rows, hot)
        fps = {}
        for vname, fn in variants.items():
            fps[vname] = fingerprint(fn(cand))  # also warms
        assert len(set(fps.values())) == 1, f"variants disagree: {fps}"
        times: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(args.trials):
            for vname, fn in variants.items():
                spark.sparkContext.setJobGroup(f"{fixture}-{vname}", vname)
                t0 = time.perf_counter()
                fn(cand).write.format("noop").mode("overwrite").save()
                times[vname].append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "fixture": fixture,
                    "rows": args.rows,
                    "fingerprint": fps["window"],
                    **{v: times[v] for v in variants},
                    **{f"{v}_min": min(times[v]) for v in variants},
                }
            ),
            flush=True,
        )
        cand.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
