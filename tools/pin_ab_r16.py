"""r16 alternating pin-vs-none A/B (VERDICT r15 §Next #1).

For each named query, runs TRIALS alternating passes with
``pinning.PIN_MODE`` flipped between "auto" (the shipped pin) and
"none" (unpinned, lineage only) in ABAB... order, so box drift hits
both variants equally. Per guide §1.4 the timed action is a noop sink
(collect drift on these queries is driver delivery, not the plan);
pass --collect to time .collect() instead (the bench's sink).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/pin_ab_r16.py \
      funnel_conversion sketch_rollup_union bm25_multiquery [--trials 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingest_spark import pinning  # noqa: E402
from ingest_spark.queries import QUERIES  # noqa: E402
from ingest_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--collect", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pin-ab-r16")
    from tools.measure_r16 import _warm

    _warm(spark, sf_dir)

    for name in args.names:
        # one untimed cold pass per variant (codegen/JIT)
        for mode in ("auto", "none"):
            pinning.PIN_MODE = mode
            QUERIES[name](spark, sf_dir).collect()
        res: dict[str, list[float]] = {"auto": [], "none": []}
        for _ in range(args.trials):
            for mode in ("auto", "none"):
                pinning.PIN_MODE = mode
                spark.sparkContext.setJobGroup(f"{name}-{mode}", name)
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                if args.collect:
                    df.collect()
                else:
                    df.write.format("noop").mode("overwrite").save()
                res[mode].append(round(time.perf_counter() - t0, 3))
        pinning.PIN_MODE = "auto"
        pairs = list(zip(res["auto"], res["none"]))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "sink": "collect" if args.collect else "noop",
                    "auto": res["auto"],
                    "none": res["none"],
                    "auto_min": min(res["auto"]),
                    "none_min": min(res["none"]),
                    "auto_wins_pairs": sum(1 for a, n in pairs if a < n),
                    "pairs": len(pairs),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
