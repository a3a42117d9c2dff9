"""Partitioned writes + partition-pruned scans.

At 100 TB the cheapest byte is the one never read: hive-style
directory partitioning (`write.partitionBy(col)`) lets a filter on the
partition column prune entire directories at PLANNING time —
`PartitionFilters` in the scan node, zero IO for excluded partitions —
where parquet row-group stats only prune after the footer read.
Choose partition columns with bounded cardinality (event_type, date)
so directories stay >= file-sized; high-cardinality keys belong in
bucketing (operators/bucketing.py) or sort order instead.

This is the partition-pruning row of SURVEY.md §4 (the reference gets
it from Iceberg partition manifests; Spark's source is hive layout +
catalog/file-index) exercised end-to-end: write the events table
partitioned by event_type, scan back with a partition predicate, and
assert the pruning in the physical plan (tests/test_plans.py).
Result-preserving, so the oracle is the plain filtered aggregate.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table

_PART_DIRS: dict[str, str] = {}  # sf_dir -> materialized partitioned copy


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write events partitioned by event_type once per (process, sf)."""
    out = _PART_DIRS.get(sf_dir)
    if out and os.path.isdir(out):
        return out
    import hashlib

    # full-path hash: distinct dirs sharing a basename must not share
    # (and overwrite) one materialized copy
    tag = (
        re.sub(r"[^0-9a-zA-Z]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
        + "_"
        + hashlib.md5(os.path.abspath(sf_dir.rstrip("/")).encode()).hexdigest()[:6]
    )
    out = os.path.join(tempfile.gettempdir(), "events_parted_" + tag)
    if os.path.isdir(out):
        shutil.rmtree(out, ignore_errors=True)
    (
        load_table(spark, sf_dir, "events")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    _PART_DIRS[sf_dir] = out
    return out


def partition_pruned_scan(spark: SparkSession, part_dir: str) -> DataFrame:
    """Scan only the click/error partitions — the directory filter the
    plan gate asserts as PartitionFilters."""
    return spark.read.parquet(part_dir).filter(
        F.col("event_type").isin("click", "error")
    )


@register(
    "partitioned_write_prune",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        WHERE event_type IN ('click', 'error')
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("partitioning", "pruning", "write"),
    doc="Hive-partitioned write (events by event_type) + partition-pruned "
    "scan: the IN filter binds as PartitionFilters, so non-matching "
    "directories are never opened — planning-time IO elimination, stronger "
    "than row-group stats pruning. Result-preserving vs the plain filtered "
    "aggregate; the PartitionFilters plan shape is gated in "
    "tests/test_plans.py.",
)
def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_dir = ensure_partitioned_events(spark, sf_dir)
    return (
        partition_pruned_scan(spark, part_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )
