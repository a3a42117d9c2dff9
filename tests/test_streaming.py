"""Structured Streaming semantics (SURVEY.md §7 Phase 5):

1. batch == stream for the same window expression (availableNow file
   stream, memory sink, complete mode)
2. withWatermark late-data policy in append mode (late rows dropped
   once the watermark passed their window)
3. applyInPandasWithState custom stateful operator vs its batch oracle
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.operators.text import tokens_col  # noqa: F401 (import check)
from local_datalakehouse_phase2_spark.sources.loaders import load_table
from local_datalakehouse_phase2_spark.streaming.event_windows import tumbling_daily_counts
from local_datalakehouse_phase2_spark.streaming.stream_runner import (
    read_event_stream,
    run_stream_to_memory,
    tumbling_daily_stream,
    user_running_stats,
)


@pytest.fixture()
def events_dir(spark, sf_small, tmp_path):
    """Copy the fixture events into a directory usable as a file-stream
    source, split into several files so availableNow sees >1 batch."""
    out = str(tmp_path / "events_stream")
    load_table(spark, sf_small, "events").withColumn(
        "ts", F.expr("unix_micros(cast(ts as timestamp)) * 1000")
    ).repartition(4).write.parquet(out)
    return out


def test_stream_equals_batch_tumbling(spark, sf_small, events_dir):
    want = {
        (r.day, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_daily_counts(spark, sf_small).collect()
    }
    stream = tumbling_daily_stream(read_event_stream(spark, events_dir))
    got_df = run_stream_to_memory(spark, stream, "tumbling_eq", output_mode="complete")
    got = {(r.day, r.event_type): (r.n_events, r.sum_value) for r in got_df.collect()}
    assert got == want


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name: str, rows):
        # integer-second -> nanos via int math (float * 1e9 loses precision)
        spark.createDataFrame(
            [(i, int(ts.timestamp()) * 10**9, 1, "t", 1.0, "{}") for i, ts in rows],
            "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(os.path.join(src, name))

    d0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    # batch 1: fills day 0 and day 2 (watermark advances to day2-1day = day 1 end)
    write_batch("b1", [(1, d0), (2, d0 + dt.timedelta(days=2, hours=12))])

    stream = tumbling_daily_stream(
        read_event_stream(spark, src + "/*"), watermark="1 day"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for day 0 (before watermark) + on-time day 3
        write_batch("b2", [(3, d0 + dt.timedelta(hours=1)), (4, d0 + dt.timedelta(days=3, hours=1))])
        q.processAllAvailable()
        # batch 3: push watermark far ahead so every window can emit
        write_batch("b3", [(5, d0 + dt.timedelta(days=10))])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.day: r.n_events for r in spark.table("late_test").collect()}
    # day 0 window closed with ONLY the on-time row: the late event_id=3 was dropped
    assert rows[dt.date(2025, 1, 1)] == 1
    # the on-time day-3 row was kept
    assert rows[dt.date(2025, 1, 4)] == 1


def test_stateful_user_stats_matches_batch(spark, sf_small, events_dir):
    ev = load_table(spark, sf_small, "events").filter(F.col("user_id") % 50 == 0)
    want = {
        r.user_id: (r.n, r.cents)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }

    stream = user_running_stats(
        read_event_stream(spark, events_dir).filter(F.col("user_id") % 50 == 0)
    )
    got_df = run_stream_to_memory(spark, stream, "user_stats", output_mode="update")
    # update mode emits one row per user per batch; the LAST emission per
    # user carries the final running totals
    latest = {}
    for r in got_df.collect():
        prev = latest.get(r.user_id)
        if prev is None or r.n_events >= prev[0]:
            latest[r.user_id] = (r.n_events, r.total_value_cents)
    assert latest == want


def test_streaming_dedup_drops_redelivered_files(spark, sf_small, tmp_path):
    """dropDuplicatesWithinWatermark: the same file delivered twice (at-
    least-once source) must come out once per event_id."""
    from local_datalakehouse_phase2_spark.streaming.stream_runner import (
        dedup_event_stream,
    )

    src = str(tmp_path / "dup_src")
    ev = (
        load_table(spark, sf_small, "events")
        .filter(F.col("event_id") < 500)
        .withColumn("ts", F.expr("unix_micros(cast(ts as timestamp)) * 1000"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    # re-deliver: copy the parquet file under a new name => second batch
    import glob

    (part,) = glob.glob(os.path.join(src, "*.parquet"))
    shutil.copy(part, os.path.join(src, "redelivered-" + os.path.basename(part)))

    stream = dedup_event_stream(read_event_stream(spark, src))
    got = run_stream_to_memory(spark, stream, "dedup_stream", output_mode="append")
    n_unique = ev.select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_stream_interval_join_equals_batch(spark, sf_small, tmp_path):
    """Stream-stream join (watermarked, time-bounded) over the file
    stream must produce exactly the batch interval-join pairs."""
    from local_datalakehouse_phase2_spark.streaming.stream_runner import (
        clicks_with_recent_errors,
    )

    ev = load_table(spark, sf_small, "events")
    want = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .join(
            ev.filter(F.col("event_type") == "error").select(
                F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
            ),
            (F.col("c_user") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("c_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("e_ts") <= F.col("c_ts")),
        )
        .count()
    )
    # single-file source: the shared events_dir fixture splits files
    # randomly, so event time regresses across micro-batches and the
    # watermark (correctly) evicts/drops what a real time-ordered feed
    # would keep. One file = one batch = a faithful in-order feed.
    ordered = str(tmp_path / "ssjoin_src")
    load_table(spark, sf_small, "events").withColumn(
        "ts", F.expr("unix_micros(cast(ts as timestamp)) * 1000")
    ).coalesce(1).write.parquet(ordered)
    stream = clicks_with_recent_errors(
        read_event_stream(spark, ordered).filter(F.col("event_type") == "click"),
        read_event_stream(spark, ordered).filter(F.col("event_type") == "error"),
    )
    got_df = run_stream_to_memory(spark, stream, "ssjoin", output_mode="append")
    assert got_df.count() == want
    assert want > 0
