"""Scale run for the E5 media-decode path (r7, after the JPEG codec
landed): synthesize N real media payloads distributed via
``attach_media_payload`` (PNG / WAV / BMP / GIF / TIFF / JPEG / opaque
cycling on doc_id % 7), run the pure-stdlib decoders through
``decode_media_features`` (Arrow-batched mapInPandas), and reduce to a
per-kind (count, sum of round(mean*60)) checksum.

The same checksum is then computed CLOSED-FORM from doc_id alone — the
fixture parameters are arithmetic in the id, exactly like the
``multimodal_media_decode`` oracle — so ``agree`` proves the distributed
decode of every payload produced the predicted feature values, not just
that the job finished. (x60 because every predictable mean is a multiple
of 1/60: JPEG tile averages have denominators 1,2,3,4,6.)

Appends one SCALE_RUNS.jsonl line (op=media_decode) with wall seconds
and rows/sec for the decode pass.

Usage: python tools/scale_run_media.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _expected_checksum(spark, n_docs: int) -> list[list]:
    """Per-kind [kind, n, sum(round(mean*60))] predicted from doc_id
    arithmetic only — no payload is built or decoded on this side."""
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    m = F.col("doc_id") % 7
    kind = (
        F.when(m == 0, F.lit("png"))
        .when(m == 1, F.lit("wav"))
        .when(m == 2, F.lit("bmp"))
        .when(m == 3, F.lit("gif"))
        .when(m == 4, F.lit("tiff"))
        .when(m == 5, F.lit("jpeg"))
        .otherwise(F.lit("opaque"))
    )
    n_tiles = (1 + F.col("doc_id") % 2) * (1 + F.col("doc_id") % 3)
    jpeg_sum = F.aggregate(
        F.sequence(F.lit(0), (n_tiles - 1).cast("int")),
        F.lit(0).cast("long"),
        lambda acc, t: acc + (F.col("doc_id") * 37 + t * 101) % 256,
    )
    mean = (
        F.when(m.isin(0, 2, 4), (F.col("doc_id") % 256).cast("double"))
        .when(m == 1, ((F.col("doc_id") % 100) * 10).cast("double"))
        .when(m == 3, ((F.col("doc_id") % 16) * 17).cast("double"))
        .when(m == 5, jpeg_sum.cast("double") / n_tiles)
        .otherwise(F.lit(None).cast("double"))
    )
    rows = (
        ids.select(kind.alias("kind"), mean.alias("mean_value"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("mean_value") * 60).cast("long")).alias("chk"),
        )
        .orderBy("kind")
        .collect()
    )
    return [[r.kind, r.n, r.chk] for r in rows]


def run(n_docs: int, spark=None) -> dict:
    from ingest_spark.operators import multimodal
    from tools import scale_runs

    own_spark = spark is None
    if own_spark:
        from ingest_spark.session import get_spark

        spark = get_spark("media-scale-run")
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("opaque text payload "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    media = multimodal.attach_media_payload(docs, "doc_id", "text")
    decoded = multimodal.decode_media_features(media)
    t0 = time.perf_counter()
    got = [
        [r.kind, r.n, r.chk]
        for r in decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("mean_value") * 60).cast("long")).alias("chk"),
        )
        .orderBy("kind")
        .collect()
    ]
    wall = round(time.perf_counter() - t0, 2)
    expected = _expected_checksum(spark, n_docs)
    entry = scale_runs.record(
        {
            "op": "media_decode",
            "params": {"study": "media_scale", "n_docs": n_docs, "n_kinds": 7},
            "wall_sec": wall,
            "rows_per_sec": round(n_docs / wall) if wall else None,
            "checksum": got,
            "agree": got == expected,
        }
    )
    print(json.dumps(entry, sort_keys=True))
    if own_spark:
        spark.stop()
    return entry


def run_mjpeg(n_docs: int, spark=None) -> dict:
    """ms/frame ledger line (VERDICT r11 §Next #6): N AVI-MJPEG docs
    with 1+doc_id%4 constant-grey frames each (the
    multimodal_mjpeg_frames fixture math), decoded by the distributed
    RIFF-walk + entropy-decode path; the per-frame (count, sum(mean))
    checksum is predicted closed-form from doc_id arithmetic, so
    ``agree`` proves every frame of every container decoded to the
    planted value at scale."""
    from ingest_spark.operators import multimodal
    from tools import scale_runs

    own_spark = spark is None
    if own_spark:
        from ingest_spark.session import get_spark

        spark = get_spark("media-scale-run")
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))

    def build(batches):
        import pandas as pd

        from ingest_spark.operators.media_codecs import (
            encode_avi_mjpeg,
            encode_jpeg,
        )

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 * (1 + doc_id % 2), 8 * (1 + doc_id % 3)
                frames = [
                    encode_jpeg(
                        w, h,
                        bytes([(doc_id * 31 + f * 57) % 256]) * (w * h),
                        channels=1,
                    )
                    for f in range(1 + doc_id % 4)
                ]
                payloads.append(encode_avi_mjpeg(w, h, frames, fps=25))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(build, "doc_id long, payload binary")
    decoded = multimodal.mjpeg_frame_features(media)
    t0 = time.perf_counter()
    got = decoded.agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.col("mean_value").cast("long")).alias("chk"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    got = [int(got["n_frames"]), int(got["chk"])]
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    exp = ids.select(
        (1 + F.col("doc_id") % 4).alias("nf"),
        F.aggregate(
            F.sequence(F.lit(0), (F.col("doc_id") % 4).cast("int")),
            F.lit(0).cast("long"),
            lambda acc, f: acc + (F.col("doc_id") * 31 + f * 57) % 256,
        ).alias("s"),
    ).agg(
        F.sum("nf").alias("n_frames"), F.sum("s").alias("chk")
    ).collect()[0]
    expected = [int(exp["n_frames"]), int(exp["chk"])]
    n_frames = expected[0]
    entry = scale_runs.record(
        {
            "op": "mjpeg_frames_decode",
            "params": {
                "study": "media_scale",
                "n_docs": n_docs,
                "n_frames": n_frames,
            },
            "wall_sec": wall,
            "frames_per_sec": round(n_frames / wall) if wall else None,
            "ms_per_frame": round(wall / n_frames * 1000, 3) if n_frames else None,
            "checksum": got,
            "agree": got == expected,
        }
    )
    print(json.dumps(entry, sort_keys=True))
    if own_spark:
        spark.stop()
    return entry


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "images"
    if mode == "mjpeg":
        run_mjpeg(n_docs)
    elif mode == "both":
        from ingest_spark.session import get_spark

        spark = get_spark("media-scale-run")
        run(n_docs, spark)
        run_mjpeg(n_docs, spark)
        spark.stop()
    else:
        run(n_docs)


if __name__ == "__main__":
    main()
