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


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user gap-based session counting (the stateful twin of the batch
    ``event_sessions`` query in operators/relational.py).

    State = (last event epoch, session count, event count) per user; a gap
    larger than ``gap_minutes`` opens a new session.  Arrow-batched — the
    pandas kernel sees each user's events as DataFrame chunks.
    """
    import pandas as pd  # noqa: F401 (kernel-side import kept explicit)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_secs = gap_minutes * 60.0

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        import pandas as pd

        ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        for t in ts.astype("int64").to_numpy() / 1e9:
            if last_ts is None or t - last_ts > gap_secs:
                n_sessions += 1
            last_ts = float(t)
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_ts double, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    df: DataFrame, query_name: str, checkpoint_dir: str, output_mode: str = "complete"
):
    """Drain all available input into an in-memory table and stop —
    the batch-equivalent execution of the streaming plan."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def interval_join_stream(events: DataFrame, window_minutes: int = 5,
                         watermark: str = "10 minutes") -> DataFrame:
    """Stream-stream event-time range join: every (error, click) pair with
    the click inside the error's (ts, ts + window] — the streaming twin of
    the batch ``interval_join`` query (operators/eventops.py).

    Spark REQUIRES an equality predicate on stream-stream joins — the
    batch query's bucketization trick (time bucketed at window width, the
    interval side exploded x2) is precisely what makes the range join
    streamable: the bucket id is the equi-key, the range predicate
    evaluates inside the matched bucket, and the two-sided time bound
    plus watermarks lets Spark expire buffered state.  Works identically
    on a batch DataFrame (no watermark branch) for the parity oracle.
    Inner join only: zero-click errors need the batch path (stream-stream
    outer joins emit on watermark expiry, trading latency for
    completeness)."""
    bucket_us = window_minutes * 60_000_000
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("ets"),
        F.explode(
            F.array(
                F.expr(f"unix_micros(ts) div {bucket_us}"),
                F.expr(f"unix_micros(ts) div {bucket_us}") + F.lit(1),
            )
        ).alias("bucket"),
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
        F.expr(f"unix_micros(ts) div {bucket_us}").alias("bucket"),
    )
    if events.isStreaming:
        err = err.withWatermark("ets", watermark)
        clk = clk.withWatermark("cts", watermark)
    # the time bounds live INSIDE the join condition (not a post-join
    # filter): Spark derives the state-expiry watermark from the join
    # predicate, so buffered rows are dropped as event time advances.
    cond = (
        (F.col("e.bucket") == F.col("c.bucket"))
        & (F.col("c.cts") > F.col("e.ets"))
        & (F.col("c.cts") <= F.col("e.ets") + F.expr(f"interval {window_minutes} minutes"))
    )
    return err.alias("e").join(clk.alias("c"), cond).select("err_id", "click_id")


def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup — the ingest-time twin of the batch
    ``exact_dup_groups`` family: re-delivered events (at-least-once
    sources, replayed waves) are dropped on the id key as they arrive.

    ``dropDuplicatesWithinWatermark`` is the scale-correct form: plain
    ``dropDuplicates`` on a stream keeps EVERY key seen forever (state
    grows with the corpus), while the watermark variant expires a key's
    state once the event-time horizon passes it — state is bounded by
    (arrival rate x watermark), independent of stream lifetime, and any
    duplicate arriving within the horizon is still caught.  Works on a
    batch DataFrame for the parity oracle (plain dropDuplicates: batch
    sees the whole input at once, so no horizon is needed)."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if ev.isStreaming:
        return ev.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return ev.dropDuplicates(["event_id"])
