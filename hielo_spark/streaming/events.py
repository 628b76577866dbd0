"""Streaming pipelines over the events feed.

Batch/stream parity: `hourly_counts` produces the same result as the
batch `events_hourly_windows` query when run over a static directory with
`trigger(availableNow=True)` — the tests assert exactly that. At scale the
same pipeline tails a directory/Kafka topic; the watermark bounds state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..session import configure

# events.parquet physical schema, legacy generation: ts = TIMESTAMP(NANOS)
# arriving as epoch-nanos long via spark.sql.legacy.parquet.nanosAsLong.
# Newer fixture generations write µs-precision TIMESTAMP_NTZ instead — use
# events_source_schema() to learn which encoding a given sf_dir carries
# rather than assuming this one.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

# sf_dir -> ts dtype string ("bigint" | "timestamp_ntz"), probed once.
_TS_DTYPE_CACHE: dict[str, str] = {}


def events_ts_dtype(spark: SparkSession, sf_dir: str) -> str:
    """Probe how this fixture generation encodes ``events.ts``.

    A one-off batch read of the parquet footer (no data scan) — the same
    dual-encoding detection the batch loader does (io.py:load_table).
    File streams require a user-supplied schema, so the stream can't
    self-detect; we detect here and hand readStream the right one.
    """
    if sf_dir not in _TS_DTYPE_CACHE:
        configure(spark)  # nanosAsLong must be set before the probe plans
        probe = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        _TS_DTYPE_CACHE[sf_dir] = dict(probe.dtypes).get("ts", "bigint")
    return _TS_DTYPE_CACHE[sf_dir]


def events_source_schema(spark: SparkSession, sf_dir: str) -> StructType:
    """The readStream schema matching this sf_dir's physical encoding."""
    if events_ts_dtype(spark, sf_dir) == "bigint":
        return EVENTS_RAW_SCHEMA
    return StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("ts", TimestampNTZType(), True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    )


def normalize_events_ts(raw: DataFrame) -> DataFrame:
    """ts → session-TZ timestamp, whatever the physical encoding.

    Mirrors io.py:load_table: epoch-nanos long gets integer ``div 1000``
    (float division loses precision past 2^53), µs-NTZ casts directly
    (session TZ pinned UTC so the instant is preserved).
    """
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _staging_dir(sf_dir: str) -> str:
    """The file stream source requires a *directory*; the fixture is a
    single parquet file. Stage a symlink dir (a real deployment's landing
    directory) — idempotent per sf_dir."""
    import hashlib

    stage = os.path.join(
        "/tmp", "hielo_stream", hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return stage


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (at scale: a landing
    directory or Kafka topic; the transformations are identical)."""
    configure(spark)
    raw = (
        spark.readStream.schema(events_source_schema(spark, sf_dir))
        .format("parquet")
        .load(_staging_dir(sf_dir))
    )
    return normalize_events_ts(raw)


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time aggregation with late-data watermark.
    State per (window, event_type) is dropped once the watermark passes —
    bounded memory on an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_to_memory(result: DataFrame, table_name: str, mode: str = "complete") -> None:
    """Drain the stream into an in-memory sink with availableNow (processes
    everything currently in the source, then stops) — the test/CI runner."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sliding_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding (hopping) 2h/1h event-time aggregation — the streaming twin
    of queries.relational.events_sliding_windows. Each event contributes to
    two windows; state per window is dropped once the watermark passes its
    end, so overlap does not grow state beyond 2× the tumbling case."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )
