"""Structured Streaming over the events table (SURVEY.md §2.B X17):
file-source stream -> event-time tumbling windows with a watermark ->
append-mode sink.

Semantics under test: with a 2-hour watermark in append mode, only windows
whose end <= (max event time - 2h) are emitted — the late-data policy.  The
batch oracle applies the same cutoff analytically, so the streaming result
is *exactly* checkable against DuckDB (a strong batch-stream equivalence
check, not just rows-only).

Scale shape: the same plan runs unchanged against a real stream (Kafka /
files landing in object storage); state is per-window partial counts,
bounded by the watermark horizon; ``availableNow`` gives batch-like
backfill runs.
"""

from __future__ import annotations

import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

ORACLES: dict[str, str] = {}

WATERMARK = "2 hours"

# events parquet physical schema: ts is INT64 nanos (read as long, then
# truncated to micros — same narrowing DuckDB applies)
_EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def streaming_hourly_counts(
    spark: SparkSession, sf_dir: str, watermark: str = WATERMARK
) -> DataFrame:
    """Run the watermarked hourly-count stream to completion
    (``availableNow``) and return the appended result."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source requires a directory; expose the single-file table
    # through a symlinked staging dir (a real deployment streams a landing
    # directory anyway)
    staging = tempfile.mkdtemp(prefix="events_stream_")
    (Path(staging) / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")
    stream = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .parquet(staging)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    windowed = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    name = f"hourly_counts_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_hourly_counts(spark, sf_dir)


# Batch twin: append mode emits exactly the windows whose end has passed
# the final watermark (max event time - 2h).
ORACLES["streaming_hourly_counts"] = """
WITH horizon AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
FROM events, horizon
GROUP BY date_trunc('hour', ts), wm
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
"""
