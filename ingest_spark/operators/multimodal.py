"""Multimodal column plumbing (extension E5).

Image/audio/video payloads ride as opaque ``binary`` columns next to a
typed metadata struct. Everything Spark-side is real — schema, Arrow
batch shape, partition-friendly layout; the actual media decode is a
clearly-marked stub (the decode libs are not in this container) with a
deterministic fake so the pipeline is testable end-to-end.

At scale: payloads dominate row size, so operators (a) never shuffle
the binary column unless the payload itself is needed downstream,
(b) decode via ``mapInPandas`` so one Arrow batch amortizes Python
transfer across thousands of rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("payload_sha256", T.StringType()),
                ]
            ),
        ),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a multimodal table from a text table: utf-8 bytes stand in
    for a media payload; metadata struct is computed JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("payload_sha256"),
        ).alias("media_meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("feature_sum", T.LongType()),
    ]
)


def _decode_media(payload: bytes) -> dict:
    """STUB: real image/audio decode (PIL/torchaudio/ffmpeg) is not
    available in this container. Deterministic fake features keep the
    plumbing testable; swap this function for the real decoder on a
    cluster with the libs installed."""
    if payload is None:
        return {"n_bytes": 0, "first_byte": -1, "feature_sum": 0}
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "feature_sum": sum(payload[:64]),
    }


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, one Python crossing per
    batch. Output drops the payload column (see module notes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_media)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]),
                    "first_byte": feats.map(lambda f: f["first_byte"]),
                    "feature_sum": feats.map(lambda f: f["feature_sum"]),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, DECODED_SCHEMA)
