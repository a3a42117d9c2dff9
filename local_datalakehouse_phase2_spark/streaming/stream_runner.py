"""True Structured Streaming execution of the event pipelines.

The registry queries in `event_windows.py` run the window expressions
in batch (that is what the DuckDB oracle can check). This module runs
the SAME expressions as an actual stream — `readStream` file source →
watermark → windowed aggregation / stateful operator → sink — so the
batch-equals-stream property (SURVEY.md §7 Phase 5) is testable, plus
the two pieces only a real stream exercises:

- `withWatermark` late-data policy (append mode emits a window only
  after the watermark passes its end; later-arriving rows are dropped)
- an `applyInPandasWithState` custom stateful operator (per-user
  running aggregate with explicit GroupState), the sanctioned
  extension point when built-in windows can't express the semantics

Scale: state size is bounded by the watermark horizon; the stateful
operator shuffles by user_id exactly once (groupBy before apply).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# events parquet has shipped with ts as either TIMESTAMP(MICROS) or
# TIMESTAMP(NANOS) (read as bigint under
# spark.sql.legacy.parquet.nanosAsLong, set in session.py), and test
# fixtures write epoch-nanos bigints directly. readStream requires an
# explicit schema, so sniff it from the existing files with a batch
# metadata read and convert adaptively (same convention as
# sources/loaders.py).
EVENTS_FILE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over event parquet files (one file = one
    micro-batch increment as files arrive)."""
    from pyspark.errors import AnalysisException

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # both ts conversions below strip a zone using the SESSION timezone
    # — pin UTC like the batch loader does, so a foreign SparkSession
    # can't shift event times relative to the batch path
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        file_schema = spark.read.parquet(events_dir).schema
    except AnalysisException:
        # Empty dir at stream definition time ("unable to infer
        # schema"): assume the long-ts fixture layout new files will
        # use. Any other failure (corrupt footer, permissions)
        # propagates — masking it would resurface later as a confusing
        # mid-stream schema mismatch.
        file_schema = EVENTS_FILE_SCHEMA
    if "ts" not in file_schema.names:
        raise ValueError(
            f"event stream source {events_dir!r} has no 'ts' column "
            f"(found {file_schema.names}); wrong directory?"
        )
    # The schema is sniffed ONCE at stream-definition time; the source
    # directory must stay homogeneous (all files TIMESTAMP or all
    # epoch-nanos long) for the stream's lifetime.
    raw = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    # TIMESTAMP (not NTZ): withWatermark only accepts TIMESTAMP event
    # time; the session timezone is UTC so values match the NTZ batch path.
    if isinstance(file_schema["ts"].dataType, LongType):
        # epoch-nanos long -> integer `div`, NOT `/`: float division of
        # ~1.7e18 exceeds double's 53-bit mantissa.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_daily_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming twin of `tumbling_daily_counts` (same expressions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain an availableNow stream into a memory sink; returns the sink
    table. availableNow processes every pending file (respecting
    maxFilesPerTrigger batching) then stops — deterministic for tests."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def clicks_with_recent_errors(
    clicks: DataFrame, errors: DataFrame, horizon: str = "10 minutes"
) -> DataFrame:
    """Stream-stream interval join: each click pairs with same-user
    errors from the preceding `horizon`. Both inputs carry watermarks
    and the join condition bounds event-time distance, so the engine
    can expire buffered rows once they can no longer match — without
    the time bound, stream-stream join state grows forever. Batch twin
    (same expressions on static frames): stream_stream_join_events."""
    c = (
        clicks.withWatermark("ts", horizon)
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    e = (
        errors.withWatermark("ts", horizon)
        .select(F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"))
    )
    return c.join(
        e,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("e_ts") <= F.col("c_ts")),
    )


def dedup_event_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming exact dedup for at-least-once sources (re-delivered
    files, replayed Kafka offsets): keep the first arrival of each
    event_id, drop re-arrivals within the watermark horizon.

    dropDuplicatesWithinWatermark bounds the dedup state by event time
    — ids older than the watermark are evicted — which is what makes
    exact streaming dedup feasible at 100 TB/day: state is a rolling
    window of ids, not the full history. (Plain dropDuplicates on a
    stream keeps ALL ids forever and OOMs; batch dedup of the full
    corpus is `dedup_exact` in operators/dedup.py.)
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# ---- custom stateful operator: applyInPandasWithState ----------------

USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value_cents", LongType()),
        StructField("last_ts", TimestampNTZType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("last_us", LongType()),
    ]
)


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last-seen) maintained in explicit
    GroupState — the custom-stateful-operator pattern for semantics the
    built-in windows can't express (e.g. lifetime aggregates that must
    survive across windows). Emits the updated row per user per batch.

    Sums are kept in integer cents: state must be exactly mergeable
    and replay-stable, and floats are neither.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # round per ROW, then sum: must match any per-row batch oracle
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
            ts_us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).max()
            last_us = max(last_us, int(ts_us))
        state.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [cents],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
