"""Learned-artifact persistence ("model registry lite"): the engine
trains small artifacts — classifier weights, BPE merge tables, PQ
codebooks, Bloom bit tables ride as DataFrames already — and a
production pipeline must persist them ON THE DATA PLANE (HDFS/S3
paths, same storage and permissions as the tables) and reload them in
a later job or a different session.

Artifacts are stored as a one-row parquet table
``(name, format_version, payload_json)``: parquet so the write is
atomic-per-job, travels with the data lake, and needs no side
channel; JSON for the payload because every artifact here is a small
driver-side structure (weights list, merge tuples, nested codebook
lists) whose fidelity survives JSON exactly (floats round-trip via
repr). Versioned so readers can refuse payloads they don't
understand.

Reference parity: the closest reference concept is the schema
registry (fetch_data_energinet.py:219-238's subject cache); this is
the same pattern for learned state instead of schemas.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

FORMAT_VERSION = 1


def save_artifact(spark: SparkSession, path: str, name: str, payload) -> None:
    """Persist a JSON-serializable artifact to ``path`` (overwrite).
    ``payload`` is any nesting of lists/dicts/numbers/strings —
    tuples are serialized as lists (JSON has no tuple), see
    ``load_artifact``."""
    row = [(name, FORMAT_VERSION, json.dumps(payload))]
    spark.createDataFrame(
        row, "name string, format_version int, payload_json string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_artifact(spark: SparkSession, path: str, expect_name: str | None = None):
    """Load an artifact saved by ``save_artifact``; returns
    ``(name, payload)``. Raises on version or name mismatch — a
    pipeline silently scoring with the wrong weights is the failure
    mode this guards."""
    # explicit schema (r15): the layout is THIS module's write contract
    # (save_artifact above), so footer schema inference per read was a
    # pure driver round trip; a mismatched on-disk file still fails
    # loudly (parquet column resolution / the row-shape checks below)
    rows = (
        spark.read.schema("name string, format_version int, payload_json string")
        .parquet(path)
        .collect()
    )
    if len(rows) != 1:
        raise ValueError(f"artifact at {path} has {len(rows)} rows, expected 1")
    r = rows[0]
    if r.format_version != FORMAT_VERSION:
        raise ValueError(
            f"artifact format_version {r.format_version} != {FORMAT_VERSION}"
        )
    if expect_name is not None and r.name != expect_name:
        raise ValueError(f"artifact name {r.name!r} != expected {expect_name!r}")
    return r.name, json.loads(r.payload_json)
