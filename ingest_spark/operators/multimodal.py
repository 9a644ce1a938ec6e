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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)

FRAME_SIZE = 256


def sample_frames(df: DataFrame, frame_size: int = FRAME_SIZE) -> DataFrame:
    """Frame sampling: one payload row fans out to N frame rows — the
    one-to-many mapInPandas shape every video pipeline needs (batch in,
    differently-sized batch out). STUB decode: "frames" are fixed-size
    byte slices (ffmpeg unavailable here); slicing, fan-out, schema and
    hashing are the real plumbing. Deterministic, so the DuckDB oracle
    reproduces frames exactly from the source text."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in FRAME_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""
                n = max(1, -(-len(payload) // frame_size))  # ceil, >=1 frame
                for i in range(n):
                    chunk = bytes(payload[i * frame_size : (i + 1) * frame_size])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_sha256"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize plumbing. Tries PIL; in this container (no PIL) it
    falls back to a clearly-marked deterministic stub that emits a
    width*height-byte "thumbnail" derived by striding the payload —
    output schema, Arrow batching and payload flow identical to the
    real path, so swapping the decoder in changes nothing upstream."""
    def _stub_resize(payload: bytes) -> bytes:
        # STUB: stride-sample the payload to exactly width*height bytes
        payload = payload or b"\x00"
        target = width * height
        return bytes(payload[(i * len(payload)) // target] for i in range(target))

    try:  # pragma: no cover - PIL not installed here
        import io

        from PIL import Image

        def _resize(payload: bytes) -> bytes:
            # NULL or undecodable payloads (this pipeline also carries
            # text-derived fakes) fall back to the stub instead of
            # killing the whole mapInPandas task
            try:
                img = Image.open(io.BytesIO(payload)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()
            except Exception:
                return _stub_resize(payload)

    except ImportError:
        _resize = _stub_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "resized": pdf["payload"].map(_resize),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


AUDIO_FEAT_DIM = 8


def audio_features(df: DataFrame) -> DataFrame:
    """Fixed-length feature vector per payload (fake MFCC: mean byte
    value over ``AUDIO_FEAT_DIM`` equal strides — torchaudio/librosa
    unavailable). Output is ``array<double>``, so it feeds directly
    into the E3 similarity operators (brute-force/LSH/IVF top-k over
    audio becomes the same code path as text embeddings)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                payload = payload or b"\x00"
                stride = max(1, len(payload) // AUDIO_FEAT_DIM)
                feats.append(
                    [
                        float(sum(payload[i * stride : (i + 1) * stride]))
                        / max(1, len(payload[i * stride : (i + 1) * stride]))
                        for i in range(AUDIO_FEAT_DIM)
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    return df.select("doc_id", "payload").mapInPandas(run, schema)
