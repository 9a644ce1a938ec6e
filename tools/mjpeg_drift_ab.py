"""Standalone min-of-N A/B for multimodal_mjpeg_frames (VERDICT r14
§Wrong #2): the query drifted up two consecutive rounds on untouched
code (sf0.1 1.085 -> 1.329 s, sf1 7.238 -> 8.394 s, sf10 44.8 ->
51.3 s standalone) — past the documented +/-15% box-variance band, so
it needs a CODE-PINNED adjudication: same box, same process shape,
current checkout vs the r12 media_codecs.py (commit cf62b76, the last
round before the drift).

This tool times whatever media_codecs.py is currently on disk; the
A/B wrapper swaps the file between processes:

    python tools/mjpeg_drift_ab.py /tmp/sf1 5 current
    git checkout cf62b76 -- ingest_spark/operators/media_codecs.py
    python tools/mjpeg_drift_ab.py /tmp/sf1 5 r12_cf62b76
    git checkout HEAD -- ingest_spark/operators/media_codecs.py

Each run: one untimed warm-up, N timed passes to a checksum sink
(count + sum(round(mean_value*60)) — engine-only, no driver-side
result collection), min + all passes ledgered with identical-checksum
assertion across passes. One SCALE_RUNS.jsonl line per variant.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    variant = sys.argv[3] if len(sys.argv) > 3 else "current"

    from ingest_spark.queries import QUERIES
    from ingest_spark.session import get_spark
    from tools.scale_runs import record

    spark = get_spark("mjpeg_drift_ab")

    def one_pass():
        df = QUERIES["multimodal_mjpeg_frames"](spark, sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("mean_value") * 60).cast("long")).alias("chk"),
        ).collect()[0]
        return (row["n"], row["chk"])

    baseline = one_pass()  # warm-up, untimed
    walls = []
    for _ in range(passes):
        t0 = time.time()
        ck = one_pass()
        walls.append(round(time.time() - t0, 3))
        assert ck == baseline, (ck, baseline)
    out = {
        "op": "mjpeg_drift_ab",
        "params": {"sf_dir": sf_dir, "variant": variant, "passes": passes,
                   "sink": "checksum"},
        "wall_sec": min(walls),
        "checksum": {"walls": walls, "n": baseline[0], "chk": baseline[1]},
    }
    record(out)
    print(f"{variant}: min={min(walls)} walls={walls} checksum={baseline}")
    spark.stop()


if __name__ == "__main__":
    main()
