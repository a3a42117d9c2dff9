"""Bucketed (co-located) joins: pre-shuffle once, join shuffle-free forever.

The lineitem⋈orders edge is the one join in the fixture star schema
that genuinely shuffles both sides (every dimension broadcasts). At
100 TB that shuffle IS the query cost — and if the same fact-fact edge
is joined repeatedly (daily pipelines, incremental rebuilds), the
idiomatic Spark fix is bucketing: write both tables bucketed AND
sorted by the join key into the warehouse, and every subsequent join
on that key is planned as a zero-exchange sort-merge join — Spark
reads bucket i of both sides co-located, no network movement at all.
Aggregations keyed on the bucket column skip their exchange too.

This is the `write.distribution-mode=hash` idea from the reference's
guide (/root/reference/SPARK_ICEBERG_GUIDE.md:326 — cluster data by
key at write time so reads don't re-shuffle) carried to its Spark
conclusion: the catalog remembers the bucketing, so the optimizer can
PROVE the co-location and delete the exchanges.

The registered query is result-preserving (oracle = plain join SQL);
the zero-exchange property is asserted on the physical plan in
tests/test_plans.py.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table

N_BUCKETS = 8


def _sf_tag(sf_dir: str) -> str:
    # full-path hash in the tag: two different dirs sharing a basename
    # (e.g. /a/sf0.1 and /b/sf0.1) must NOT collide into one cache
    import hashlib

    base = re.sub(r"[^0-9a-zA-Z]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    digest = hashlib.md5(os.path.abspath(sf_dir.rstrip("/")).encode()).hexdigest()[:6]
    return f"{base}_{digest}"


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """The in-memory catalog forgets tables across processes but their
    warehouse directories persist; saveAsTable then fails with
    LOCATION_ALREADY_EXISTS. The directory is a derived cache of the
    fixtures, so a stale (catalog-unknown) one is safe to remove."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:") :]
    loc = os.path.join(wh, table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem + orders (join columns only) as bucketed, sorted
    warehouse tables — the one-time pre-shuffle. Idempotent per sf."""
    tag = _sf_tag(sf_dir)
    li_tbl, o_tbl = f"lineitem_bkt_{tag}", f"orders_bkt_{tag}"
    if not spark.catalog.tableExists(li_tbl):
        _clear_stale_location(spark, li_tbl)
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(li_tbl)
        )
    if not spark.catalog.tableExists(o_tbl):
        _clear_stale_location(spark, o_tbl)
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(o_tbl)
        )
    return li_tbl, o_tbl


def colocated_join(spark: SparkSession, li_tbl: str, o_tbl: str) -> DataFrame:
    """The shuffle-free fact-fact join over the bucketed tables."""
    li = spark.table(li_tbl)
    o = spark.table(o_tbl)
    return li.join(o, li.l_orderkey == o.o_orderkey)


@register(
    "bucketed_colocated_join",
    oracle="""
        SELECT o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("join", "bucketing", "colocated"),
    doc="lineitem⋈orders with both sides bucketed by the join key at write "
    "time: the join itself plans with ZERO exchanges (asserted in "
    "tests/test_plans.py) — bucket i of lineitem joins bucket i of orders "
    "in place. Result-preserving, so the oracle is the plain join SQL. The "
    "write is the amortized one-time shuffle; every later join or agg on "
    "the bucket key rides it for free.",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li_tbl, o_tbl = ensure_bucketed_tables(spark, sf_dir)
    return (
        colocated_join(spark, li_tbl, o_tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("line_count"),
        )
        .orderBy("o_orderpriority")
    )
