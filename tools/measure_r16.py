"""r16 optimization measurement harness (guide §1).

For each named query: one cold pass, N steady collect passes, N steady
noop-sink passes (guide §1.4 — times the computation, not driver row
delivery), Spark JOB COUNT per pass (iterative operators run eager
sub-jobs during DataFrame construction, so the job count is the
round-trip budget the optimization work targets), and the
``explain("formatted")`` plan written to plans/r16/<name>_<tag>.txt.

Usage:
  python tools/measure_r16.py [--tag before|after] [--passes 3] q1 q2 ...
  python tools/measure_r16.py --all            # whole headline set
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingest_spark.queries import QUERIES  # noqa: E402
from ingest_spark.session import get_spark  # noqa: E402


def _warm(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    QUERIES["s2_bounds_discovery"](spark, sf_dir).collect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
    a = spark.range(1000).withColumn("k", F.pmod("id", F.lit(10)))
    b = spark.range(10).withColumnRenamed("id", "k")
    a.join(F.broadcast(b), "k").groupBy("k").count().collect()
    a.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    ).filter(F.col("rn") <= 2).collect()

    @F.pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_w("id")).collect()


def _n_jobs(spark, group):
    tracker = spark.sparkContext.statusTracker()
    return len(tracker.getJobIdsForGroup(group))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--tag", default=None, help="write plans/r16/<q>_<tag>.txt")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args.names
    if args.all:
        import bench

        names = list(bench.HEADLINE)
    spark = get_spark("measure-r16")
    _warm(spark, sf_dir)
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        rec: dict = {}
        sc = spark.sparkContext
        # cold
        sc.setJobGroup(f"{name}-cold", name)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        rec["build_s"] = round(time.perf_counter() - t0, 3)
        rows = df.collect()
        rec["cold_s"] = round(time.perf_counter() - t0, 3)
        rec["rows"] = len(rows)
        rec["jobs_cold"] = _n_jobs(spark, f"{name}-cold")
        # steady collect
        coll = []
        for i in range(args.passes):
            sc.setJobGroup(f"{name}-st{i}", name)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            coll.append(time.perf_counter() - t0)
        rec["collect_min_s"] = round(min(coll), 3)
        rec["collect_all"] = [round(x, 3) for x in coll]
        rec["jobs_steady"] = _n_jobs(spark, f"{name}-st0")
        # steady noop
        if not args.no_noop:
            noop = []
            for i in range(args.passes):
                sc.setJobGroup(f"{name}-np{i}", name)
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                noop.append(time.perf_counter() - t0)
            rec["noop_min_s"] = round(min(noop), 3)
        sc.setJobGroup(f"{name}-x", name)
        if args.tag:
            jdf = QUERIES[name](spark, sf_dir)._jdf
            plan_txt = spark._jvm.PythonSQLUtils.explainString(
                jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as fh:
                fh.write(plan_txt)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
