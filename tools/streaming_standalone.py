"""Standalone streaming throughput trials (r12, VERDICT r11 §Next #3).

The in-suite streaming leg rides along after the batch suite, and the
r11 ledger (streaming_leg_standalone_trials_r11) proved the recorded
rows/s is contention- AND JIT-ramp-tainted there: 6.6k -> 10.1k rows/s
across back-to-back trials on identical code. Round-over-round
comparisons need a CLEAN number: an idle box, a generous warm-up, and
N >= 3 measured trials in one JVM.

This runs the exact pipeline bench.py's leg measures (bench_streaming.
run_pipeline: file-source JSON -> content hash -> watermarked
dropDuplicatesWithinWatermark -> watermarked 15-min window agg ->
checkpointed parquet sink, AvailableNow) at the leg's row size
(50k, SPARK_GRAFT_STREAM_ROWS to override), after TWO untimed 50k
warm-up drains (the r11 trials showed one 5k drain is not enough to
finish JIT ramp-up). Reports every trial plus the median of the last
3 — the number BASELINE.md cites for round comparisons.

Appends one SCALE_RUNS.jsonl line (op streaming_standalone_sf10) and
prints the JSON entry.

Usage: python tools/streaming_standalone.py [trials]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_streaming as bs
from ingest_spark.session import get_spark
from tools import scale_runs

trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
n_rows = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "50000"))

spark = get_spark("streaming_standalone")
spark.sparkContext.setLogLevel("ERROR")

workdir = tempfile.mkdtemp(prefix="stream_standalone_")
rates: list[float] = []
walls: list[float] = []
try:
    # warm-up drains: full-size, untimed, fresh checkpoint each —
    # classloading + JIT for the whole micro-batch engine path
    for w in range(2):
        src = f"{workdir}/warm_src_{w}"
        bs.generate_input(spark, src, n_rows, 16)
        bs.run_pipeline(spark, src, f"{workdir}/warm_{w}")
    for t in range(trials):
        src = f"{workdir}/src_{t}"
        bs.generate_input(spark, src, n_rows, 16)
        run = bs.run_pipeline(spark, src, f"{workdir}/trial_{t}")
        rates.append(round(n_rows / run["wall_sec"], 1))
        walls.append(run["wall_sec"])
        print(f"trial {t}: {run['wall_sec']:.2f} s -> {rates[-1]} rows/s")
finally:
    shutil.rmtree(workdir, ignore_errors=True)

median_last3 = statistics.median(rates[-3:])
entry = scale_runs.record(
    {
        "op": "streaming_standalone_sf10",
        "params": {
            "rows_per_trial": n_rows,
            "trials": trials,
            "warmup": "2 full-size untimed drains",
            "note": (
                "VERDICT r11 Next #3: idle-box standalone trials; "
                "median of last 3 is the round-comparison number "
                "(in-suite leg numbers are contention-tainted)"
            ),
        },
        "wall_sec": round(statistics.median(walls[-3:]), 3),
        "checksum": {
            "rows_per_sec_trials": rates,
            "rows_per_sec_median_last3": median_last3,
        },
    }
)
print(entry)
