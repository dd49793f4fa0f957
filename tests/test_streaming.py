"""Structured Streaming parity: the streaming hourly-window plan must
produce exactly the batch result when drained with availableNow."""

import pandas as pd
import pytest

from kgforge.streaming import events as se


@pytest.mark.usefixtures("spark")
def test_stream_matches_batch(spark, sf_dir, tmp_path):
    import shutil

    src_dir = tmp_path / "events_stream_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0.parquet")

    batch = se.hourly_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))
    stream = se.hourly_agg(se.read_events_stream(spark, str(src_dir)))
    assert stream.isStreaming

    se.run_available_now(stream, "hourly_test", str(tmp_path / "ckpt"))
    got = (
        spark.sql("select * from hourly_test")
        .toPandas()
        .sort_values(["win_start", "event_type"], ignore_index=True)
    )
    want = batch.toPandas().sort_values(["win_start", "event_type"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization == batch window sessionization
    when the whole input arrives as one micro-batch."""
    import shutil

    from kgforge.operators.relational import event_sessions

    src_dir = tmp_path / "events_state_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0.parquet")

    stream = se.sessionize_stream(se.read_events_stream(spark, str(src_dir)))
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from sessions_test")
        .groupBy("user_id")
        .agg({"n_sessions": "max", "n_events": "max"})
        .toPandas()
        .rename(columns={"max(n_sessions)": "n_sessions", "max(n_events)": "n_events"})
        .sort_values("user_id", ignore_index=True)
    )
    want = (
        event_sessions(spark, sf_dir)
        .toPandas()
        .sort_values("user_id", ignore_index=True)[["user_id", "n_sessions", "n_events"]]
    )
    pd.testing.assert_frame_equal(got[["user_id", "n_sessions", "n_events"]], want, check_dtype=False)


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream time-range self-join parity: the availableNow run
    over the file source must emit exactly the batch join's pair set."""
    import shutil

    from kgforge.streaming.events import interval_join_stream, read_events_stream

    src = "/root/testdata/sf0.001/events.parquet"
    src_dir = tmp_path / "events_ivj_src"
    src_dir.mkdir()
    shutil.copy(src, src_dir / "part-0.parquet")
    stream = interval_join_stream(read_events_stream(spark, str(src_dir)))
    q = (
        stream.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["err_id"], r["click_id"]) for r in spark.sql("select * from ivj").collect()}

    batch = interval_join_stream(spark.read.parquet(src))
    want = {(r["err_id"], r["click_id"]) for r in batch.collect()}
    assert want, "fixture must produce at least one in-window pair"
    assert got == want


def test_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming exact dedup parity: two identical ingest waves (an
    at-least-once redelivery) must collapse to exactly the original
    event-id set, matching the batch dropDuplicates oracle."""
    import shutil

    src_dir = tmp_path / "events_dup_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "wave-0.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "wave-1.parquet")

    stream = se.dedup_events_stream(se.read_events_stream(spark, str(src_dir)))
    assert stream.isStreaming
    se.run_available_now(stream, "dedup_test", str(tmp_path / "ckpt_dedup"), output_mode="append")

    got = sorted(
        r["event_id"] for r in spark.sql("select event_id from dedup_test").collect()
    )
    doubled = spark.read.parquet(str(src_dir))
    want = sorted(
        r["event_id"]
        for r in se.dedup_events_stream(doubled).select("event_id").collect()
    )
    n_orig = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert doubled.count() == 2 * n_orig  # the redelivery really doubled the input
    assert got == want and len(got) == n_orig
