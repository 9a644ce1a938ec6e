"""The windowed REST producer as a first-class Spark data source.

Re-expresses the reference's fetch loop (S1/S3,
producers/energinet/fetch_data_energinet.py:91-101,139-186) through
PySpark 4's Python DataSource API: each fetch window becomes an
``InputPartition``, so the day-chunked loop the reference runs
serially on one pod becomes N parallel executor-side fetches behind a
plain ``spark.read.format("windowed_rest")`` — filter pushdown of the
time range is structural (the window IS the partition), and the result
composes with every DataFrame operator with no driver involvement.

The fetch function is injected as an importable path
(``pkg.module:callable``) because options must be strings and
executors re-import rather than unpickle. ``fetch=synthetic`` uses the
built-in deterministic generator (tests, offline development).

Usage::

    spark.dataSource.register(WindowedRestDataSource)
    df = (spark.read.format("windowed_rest")
          .schema("ts timestamp, user_id bigint, value double")
          .option("start", "2024-01-01").option("end", "2024-01-08")
          .option("step_days", "1")
          .option("fetch", "my_pkg.fetchers:energinet")
          .load())
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class WindowPartition(InputPartition):
    def __init__(self, start: str, end: str):
        self.start = start
        self.end = end


def synthetic_fetch(start: datetime, end: datetime) -> list[dict]:
    """Deterministic offline stand-in for a remote API: ~24 rows per
    day window, values derived from a sha256 of the timestamp (stable
    across runs/engines — same contract as functions.hashing)."""
    rows = []
    t = start
    while t < end:
        h = int.from_bytes(
            hashlib.sha256(t.isoformat().encode()).digest()[:4], "big"
        )
        rows.append(
            {
                "ts": t,
                "user_id": h % 1000,
                "value": round((h % 10_000) / 100.0, 2),
            }
        )
        t += timedelta(hours=1)
    return rows


def _resolve_fetch(spec: str):
    if spec == "synthetic":
        return synthetic_fetch
    mod, _, fn = spec.partition(":")
    if not fn:
        raise ValueError(
            f"fetch option must be 'synthetic' or 'module.path:callable', got {spec!r}"
        )
    import importlib

    return getattr(importlib.import_module(mod), fn)


class WindowedRestReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_fields = [f.name for f in schema.fields]
        self.fetch_spec = options.get("fetch", "synthetic")
        _resolve_fetch(self.fetch_spec)  # fail at planning, not mid-job
        self.start = datetime.fromisoformat(options["start"])
        self.end = datetime.fromisoformat(options["end"])
        self.step = timedelta(days=int(options.get("step_days", "1")))
        if self.step <= timedelta(0):
            raise ValueError("step_days must be positive")
        if self.start > self.end:
            raise ValueError(f"start {self.start} > end {self.end}")

    def partitions(self) -> list[WindowPartition]:
        """One partition per fetch window — the unit of parallelism
        AND the pushed-down time-range predicate."""
        out = []
        t = self.start
        while t < self.end:
            out.append(
                WindowPartition(t.isoformat(), min(t + self.step, self.end).isoformat())
            )
            t += self.step
        return out

    def read(self, partition: WindowPartition) -> Iterator[tuple]:
        fetch = _resolve_fetch(self.fetch_spec)
        lo = datetime.fromisoformat(partition.start)
        hi = datetime.fromisoformat(partition.end)
        for rec in fetch(lo, hi) or []:
            yield tuple(rec.get(name) for name in self.schema_fields)


class WindowedRestStreamReader(DataSourceStreamReader):
    """Streaming variant: the reference's Redis date-checkpoint (T8,
    fetch_data_energinet.py:149-154) becomes Spark's OWN streaming
    offset log. The offset is {"next": iso_ts} = "windows before this
    are ingested"; each micro-batch covers the windows between the
    committed and latest offset, one InputPartition per window
    (executor-parallel fetch). Restarting against the same checkpoint
    resumes exactly — replayed windows are impossible by construction,
    no external state store."""

    def __init__(self, schema, options):
        self._batch = WindowedRestReader(schema, options)

    def initialOffset(self) -> dict:
        return {"next": self._batch.start.isoformat()}

    def latestOffset(self) -> dict:
        # STATELESS and monotone: always the configured end. Spark may
        # instantiate several reader objects for one query (observed:
        # planning and execution instances alternate), so any
        # instance-local pacing state produces non-monotone offsets —
        # which Spark accepts, silently re-reading the overlap. A live
        # polling deployment returns now() truncated to the window
        # step here — still stateless; batch cadence (T10 pacing) is
        # the trigger's job, batch size the window step's.
        return {"next": self._batch.end.isoformat()}

    def partitions(self, start: dict, end: dict) -> list[WindowPartition]:
        lo = datetime.fromisoformat(start["next"])
        hi = datetime.fromisoformat(end["next"])
        out = []
        t = lo
        while t < hi:
            out.append(
                WindowPartition(
                    t.isoformat(), min(t + self._batch.step, hi).isoformat()
                )
            )
            t += self._batch.step
        return out

    def read(self, partition: WindowPartition) -> Iterator[tuple]:
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the Spark checkpoint; nothing external

    def stop(self) -> None:
        pass


class WindowedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "windowed_rest"

    def reader(self, schema) -> WindowedRestReader:
        return WindowedRestReader(schema, self.options)

    def streamReader(self, schema) -> WindowedRestStreamReader:
        return WindowedRestStreamReader(schema, self.options)
