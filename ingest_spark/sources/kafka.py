"""Kafka source/sink wiring (reference S5/K1).

The reference consumes and produces Kafka directly
(consumer/consumer.py:19-24 subscribe/poll;
producers/energinet/fetch_data_energinet.py:249-254 produce+flush).
On Spark the equivalent is the built-in ``format("kafka")`` connector:
a streaming (or batch) scan whose partitions map 1:1 onto Kafka
topic-partitions — offsets ARE the checkpoint (T8), consumer groups
are managed by the source, and backpressure is ``maxOffsetsPerTrigger``
(T10, the reference's poll-loop pacing).

No broker (or spark-sql-kafka jar) exists in this sandbox, so the
builders here stop at the fully-configured reader/writer — the exact
option dict the connector consumes — and the record-level serde
(`decode_records` / `encode_records`, the latter shared with
``streaming.pipeline.to_kafka_frame``) runs on ANY frame with the
connector's fixed schema, which the tests synthesize statically. On a
real cluster, ``.load()`` / ``.start()`` on the returned builders is
the only extra call.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The kafka connector's fixed scan output schema (Spark docs,
# structured-streaming-kafka-integration): serde below is written
# against THIS, not against a live source, so it is testable offline.
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


@dataclass
class KafkaSourceSpec:
    """Declarative subscription: everything the reference's consumer
    config carries (bootstrap, group, offset reset —
    consumer/consumer.py:10-16) plus the Spark-side throughput knobs."""

    bootstrap_servers: str
    subscribe: str | None = None          # comma-separated topic list
    subscribe_pattern: str | None = None  # regex alternative
    starting_offsets: str = "earliest"    # or latest / per-partition JSON
    ending_offsets: str | None = None     # batch reads only
    max_offsets_per_trigger: int | None = None  # T10 backpressure
    fail_on_data_loss: bool = True
    group_id_prefix: str | None = None
    extra: dict[str, str] = field(default_factory=dict)

    def options(self, streaming: bool = True) -> dict[str, str]:
        if (self.subscribe is None) == (self.subscribe_pattern is None):
            raise ValueError(
                "exactly one of subscribe / subscribe_pattern is required"
            )
        opts: dict[str, str] = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "startingOffsets": self.starting_offsets,
            "failOnDataLoss": str(self.fail_on_data_loss).lower(),
        }
        if self.subscribe is not None:
            opts["subscribe"] = self.subscribe
        else:
            opts["subscribePattern"] = self.subscribe_pattern
        if streaming:
            if self.max_offsets_per_trigger is not None:
                opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        else:
            opts["endingOffsets"] = self.ending_offsets or "latest"
        if self.group_id_prefix is not None:
            opts["groupIdPrefix"] = self.group_id_prefix
        opts.update(self.extra)
        return opts


@dataclass
class KafkaSinkSpec:
    """Producer-side config (the reference's producer_config,
    fetch_data_energinet.py:240-247): bootstrap + topic + delivery
    semantics. Spark's sink batches and acks per task — the
    per-record flush anti-pattern has no analogue here by design."""

    bootstrap_servers: str
    topic: str
    checkpoint_location: str | None = None  # streaming writes
    extra: dict[str, str] = field(default_factory=dict)

    def options(self, streaming: bool = False) -> dict[str, str]:
        """checkpointLocation is emitted only for the streaming writer:
        on a batch DataFrameWriter it is a meaningless no-op that can
        mask a misconfigured streaming sink spec."""
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
        }
        if streaming and self.checkpoint_location is not None:
            opts["checkpointLocation"] = self.checkpoint_location
        opts.update(self.extra)
        return opts


def read_kafka_stream(spark: SparkSession, spec: KafkaSourceSpec):
    """Fully-configured streaming reader (S5). ``.load()`` yields the
    KAFKA_RECORD_SCHEMA frame; offsets checkpoint with the query."""
    return spark.readStream.format("kafka").options(**spec.options(streaming=True))


def read_kafka_batch(spark: SparkSession, spec: KafkaSourceSpec):
    """Batch (bounded offset-range) reader — the reference's one-shot
    backfill mode; startingOffsets..endingOffsets bound the scan."""
    return spark.read.format("kafka").options(**spec.options(streaming=False))


def write_kafka(df: DataFrame, spec: KafkaSinkSpec):
    """Batch writer over an encoded (key,value) frame (K1)."""
    return df.write.format("kafka").options(**spec.options(streaming=False))


def write_kafka_stream(df: DataFrame, spec: KafkaSinkSpec):
    """Streaming writer; checkpoint_location carries the sink's
    exactly-once offset log."""
    return df.writeStream.format("kafka").options(**spec.options(streaming=True))


def decode_records(
    records: DataFrame,
    value_schema: T.StructType,
    key_type: str = "string",
    keep_meta: bool = True,
) -> DataFrame:
    """Kafka record frame -> typed columns (T13 shape, JSON body):
    cast key, parse value with an explicit schema (PERMISSIVE — bad
    payloads become nulls, they never kill the stream), lift the
    struct. Works identically on a real kafka scan or a synthesized
    frame with the same schema."""
    meta = ["topic", "partition", "offset", "timestamp"] if keep_meta else []
    return records.select(
        F.col("key").cast(key_type).alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        *meta,
    ).select("key", "v.*", *meta)


def encode_records(
    df: DataFrame, key_col: str, value_cols: list[str] | None = None
) -> DataFrame:
    """Typed frame -> kafka sink contract (key/value binary). Thin
    alias of streaming.pipeline.to_kafka_frame (T12/K1) so source and
    sink serde live in one module."""
    from ingest_spark.streaming.pipeline import to_kafka_frame

    return to_kafka_frame(df, key_col, value_cols)
