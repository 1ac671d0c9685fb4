"""Typed feed-source adapters: the queue seam for StreamingApply.

The reference's continuous mode tails a blocking Redis queue
(chomper/contrib/redis.py:15-61 — QueueReader.blpop :39-61); its
feeder/reader split means swapping the queue technology touches one
class.  This module is that seam rebuilt Spark-native: a ``FeedSource``
builds the streaming DataFrame, and everything downstream of
``StreamingApply`` (watermark, foreachBatch, staging, MERGE, ledger,
lineage) is source-agnostic.

``FileFeedSource`` is the sandbox queue stand-in (a growing directory
tailed by ``readStream``); ``KafkaFeedSource`` is the production queue
shape — its option set and value-decode are real code under contract
tests, only the final ``.load()`` needs the Kafka connector jar on the
classpath (not present in this sandbox).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from chomper_spark import schema as S


class FeedSource:
    """Builds the (streaming) change-event DataFrame for StreamingApply.

    Contract: ``load(spark)`` returns a DataFrame with the change-event
    schema (op, op_ts, batch_seq, conv_id, turn_idx, ...) and an
    event-time watermark on op_ts.  Correctness never depends on the
    watermark — the MERGE is version-checked per key — it documents the
    late-event contract for windowed consumers downstream.
    """

    def load(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError


def _with_watermark(df: DataFrame, watermark: str) -> DataFrame:
    # batch DataFrames (decode() under test, replay jobs) skip the
    # watermark — it is a streaming-only concept
    return df.withWatermark("op_ts", watermark) if df.isStreaming else df


@dataclass
class FileFeedSource(FeedSource):
    """Tail a growing directory of parquet files — the sandbox queue.

    ``maxFilesPerTrigger`` bounds micro-batch size (the analogue of a
    queue consumer's poll batch)."""

    feed_dir: str
    feed_schema: T.StructType = field(default_factory=lambda: S.CHANGE_EVENT)
    max_files_per_trigger: int = 1
    watermark: str = "10 minutes"

    def options(self) -> dict[str, str]:
        return {"maxFilesPerTrigger": str(self.max_files_per_trigger)}

    def load(self, spark: SparkSession) -> DataFrame:
        stream = (
            spark.readStream.schema(self.feed_schema)
            .options(**self.options())
            .parquet(self.feed_dir)
        )
        return _with_watermark(stream, self.watermark)


@dataclass
class KafkaFeedSource(FeedSource):
    """Tail a Kafka topic of JSON-encoded change events.

    The exact reader option set is code (``options()``), and the
    value→typed-columns projection (``decode()``) is testable on a
    static DataFrame with Kafka's (value binary) shape — the ONLY
    untestable-in-sandbox step is ``.format("kafka").load()`` itself,
    which needs the spark-sql-kafka connector jar."""

    brokers: str
    topic: str
    feed_schema: T.StructType = field(default_factory=lambda: S.CHANGE_EVENT)
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int = 10_000
    watermark: str = "10 minutes"

    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.brokers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
            # maxFilesPerTrigger analogue: bounds micro-batch size
            "maxOffsetsPerTrigger": str(self.max_offsets_per_trigger),
        }

    def decode(self, raw: DataFrame) -> DataFrame:
        """Kafka record → typed change event: value is a JSON-encoded
        event.  from_json turns unparseable values into all-NULL
        structs; those are DROPPED here — parity with the batch
        feeders' DROPMALFORMED means a corrupt message never reaches
        the MERGE as a phantom all-NULL event nor inflates events_in
        (a production deployment would tee them to a dead-letter
        topic before this filter).

        The drop is COUNTED, not silent: a named observation
        ``kafka_decode`` rides the plan with ``records_in`` /
        ``corrupt_dropped``, so schema drift on the topic (valid JSON
        that matches none of the expected fields, e.g. ``{}`` or a
        renamed-field producer) is distinguishable from an idle topic.
        Streaming: read it from StreamingQueryProgress
        ``observedMetrics["kafka_decode"]`` per micro-batch; batch
        replay: via ``Observation`` semantics on the first action."""
        out = raw.select(
            F.from_json(F.col("value").cast("string"), self.feed_schema).alias("e")
        )
        corrupt = F.forall(
            F.array(*[F.col(f"e.{f_.name}").isNull() for f_ in self.feed_schema.fields]),
            lambda x: x,
        )
        metrics = [
            F.count(F.lit(1)).alias("records_in"),
            # coalesce: an empty micro-batch must report 0, not NULL
            F.coalesce(F.sum(corrupt.cast("long")), F.lit(0)).alias(
                "corrupt_dropped"
            ),
        ]
        if raw.isStreaming:
            out = out.observe("kafka_decode", *metrics)
        else:
            # batch replays get a direct handle (Observation values
            # populate on the first action over the decoded frame)
            from pyspark.sql import Observation

            self.last_decode_observation = Observation()
            out = out.observe(self.last_decode_observation, *metrics)
        out = out.filter(~corrupt).select("e.*")
        return _with_watermark(out, self.watermark)

    def load(self, spark: SparkSession) -> DataFrame:
        raw = spark.readStream.format("kafka").options(**self.options()).load()
        return self.decode(raw)


# The exact column set spark-sql-kafka's reader produces — the wire
# shape KafkaFeedSource.decode consumes.
KAFKA_WIRE = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


@dataclass
class KafkaWireReplaySource(KafkaFeedSource):
    """Replay Kafka-wire-shaped records (``KAFKA_WIRE``: key/value
    binary, topic, partition, offset, timestamp) from a growing parquet
    directory through the REAL ``KafkaFeedSource.decode`` — the
    connector-free harness for the Kafka seam.  Everything except the
    broker connection itself (``format("kafka")`` in the parent's
    ``load``) is the production code path: JSON value decode, corrupt-
    message drop, watermark, then StreamingApply's foreachBatch /
    staging / MERGE / checkpoint resume downstream.

    Use it to replay captured topic dumps offline, and in tests to
    drive the seam end-to-end where no broker exists."""

    # brokers/topic are connection fields of the parent; offline replay
    # never dials a broker, so they default to a marker value here —
    # wire_dir is the only input a replay caller must supply.
    brokers: str = "offline-replay"
    topic: str = "offline-replay"
    wire_dir: str = ""
    max_files_per_trigger: int = 1

    def load(self, spark: SparkSession) -> DataFrame:
        if not self.wire_dir:
            raise ValueError("KafkaWireReplaySource needs wire_dir")
        raw = (
            spark.readStream.schema(KAFKA_WIRE)
            .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
            .parquet(self.wire_dir)
        )
        return self.decode(raw)
