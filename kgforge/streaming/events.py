"""Structured Streaming surface.

The reference is entirely batch (SURVEY.md §2.9), so streaming is optional
coverage: the same tumbling-window aggregation as the batch
``events_hourly`` query (operators/relational.py), expressed as a
readStream -> watermark -> windowed agg -> writeStream plan.  Tests run it
with trigger(availableNow=True) against the parquet events table and assert
batch/stream parity — the Spark-idiomatic proof that one logical plan
serves both execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over the events parquet directory."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)


def hourly_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window agg with late-data watermark — works identically
    on a batch or streaming DataFrame (pass a batch read for the oracle)."""
    # watermarks require TIMESTAMP (with timezone); the parquet column is
    # TIMESTAMP_NTZ — cast on both paths so batch/stream stay comparable
    # (session timezone is pinned to UTC in session.py).
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )


def run_available_now(df: DataFrame, query_name: str, checkpoint_dir: str):
    """Drain all available input into an in-memory table and stop —
    the batch-equivalent execution of the streaming plan."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
