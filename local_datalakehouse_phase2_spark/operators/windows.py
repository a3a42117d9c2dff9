"""Window functions: ranking, offsets, running frames.

SURVEY.md §2.5 gap — no OVER clause anywhere in the reference; part of
the Phase-3 relational breadth. All windows order by a unique
tiebreaker column so results are deterministic and oracle-comparable.

Scale note: a window's partitionBy is a shuffle key. Partitioning by a
high-cardinality key (custkey, user_id) scales linearly; a window with
no partitionBy would funnel everything through one task and is avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table


@register(
    "window_topk_per_group",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice AS total_price, rn
        FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        WHERE rn <= 3
    """,
    tags=("window", "topk"),
    doc="Top-3 orders per market segment via ROW_NUMBER — the scalable top-k-per-"
    "group idiom (no global sort, no collect).",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", F.col("o_totalprice").alias("total_price"), "rn")
    )


@register(
    "window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_spend
        FROM orders
        WHERE o_custkey % 10 = 0
    """,
    tags=("window", "frame"),
    doc="Cumulative spend per customer: running-sum frame UNBOUNDED PRECEDING → CURRENT ROW.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_lag_delta",
    oracle="""
        SELECT user_id, event_id,
               value - LAG(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS delta_from_prev
        FROM events
        WHERE user_id % 25 = 0
    """,
    tags=("window", "offset"),
    doc="LAG offset function: per-user delta between consecutive event values.",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_from_prev"),
    )


@register(
    "window_rank_dense",
    oracle="""
        SELECT p_brand, p_partkey,
               RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_rank,
               DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_dense_rank
        FROM part
        WHERE p_type = 'ECONOMY'
    """,
    tags=("window", "rank"),
    doc="RANK vs DENSE_RANK with real ties (p_size is low-cardinality int).",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    w = W.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("size_rank"),
        F.dense_rank().over(w).alias("size_dense_rank"),
    )


@register(
    "window_share_of_group",
    oracle="""
        SELECT n_name, c_custkey,
               ROUND(c_acctbal / SUM(c_acctbal) OVER (PARTITION BY n_name), 6) AS bal_share
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 0 AND c_custkey % 20 = 0
    """,
    tags=("window", "frame"),
    doc="Unordered window aggregate: each row's share of its group total in one pass "
    "(no self-join back to a grouped subquery).",
)
def window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_acctbal") > 0) & (F.col("c_custkey") % 20 == 0)
    )
    n = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            F.round(F.col("c_acctbal") / F.sum("c_acctbal").over(w), 6).alias("bal_share"),
        )
    )


@register(
    "window_trailing_range",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
               ), 2) AS trailing_30d
        FROM orders
        WHERE o_custkey < 200
    """,
    tags=("window", "range-frame", "temporal"),
    doc="Time-RANGE window frame: per-customer trailing-30-day revenue at "
    "each order. RANGE frames are PEER-INCLUSIVE (same-timestamp rows "
    "always aggregate together), so the result is deterministic under "
    "ties where a ROWS frame would not be. Spark expresses the interval "
    "as rangeBetween over epoch seconds — same frame DuckDB's INTERVAL "
    "RANGE computes. Window state is one partition's rows; keying by "
    "customer keeps partitions bounded at any corpus size.",
)
def window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        W.partitionBy("o_custkey")
        # cast to double, NOT unix_timestamp: the latter truncates to
        # whole seconds, shifting both the 30-day boundary and peer
        # grouping for sub-second timestamps; the double cast keeps
        # microseconds as the fraction, matching INTERVAL RANGE exactly
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("double"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d"),
    )


@register(
    "window_distribution_ranks",
    oracle="""
        SELECT s_suppkey, s_nationkey,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("window", "rank", "distribution"),
    doc="Distribution ranks per nation: NTILE quartiles, PERCENT_RANK, "
    "CUME_DIST. The ORDER BY breaks acctbal ties with the unique suppkey — "
    "without it NTILE assignment at tie boundaries is engine-dependent and "
    "can never hash-match. One shuffle on the partition key; each "
    "partition sorts locally.",
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
