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
