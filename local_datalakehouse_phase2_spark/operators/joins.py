"""Join operators: broadcast-hash, sort-merge, semi/anti, outer, non-equi.

SURVEY.md §2.3: the reference's runbook never joins, but its engines
(Spark 3.5 / Trino 476) do — so we implement the full join surface per
the north star, TPC-H-shaped. All joins are declarative
`df.join(...)`; Catalyst + AQE pick broadcast vs sort-merge vs
shuffled-hash at runtime.

Scale notes (100 TB):
- Dimension tables (region/nation/part/supplier, even customer) are
  broadcast explicitly with F.broadcast — no shuffle of the fact side.
- Fact-fact joins (lineitem ⋈ orders) shuffle on the join key; AQE
  skew-join splitting is enabled in the session factory.
- Semi/anti joins use 'left_semi'/'left_anti' so only the key column
  of the right side is shuffled and the build side stays small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..localrows import local_df
from ..registry import register
from ..sources.loaders import load_table


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(o_orderdate AS DATE) AS order_date,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    doc="TPC-H Q3 shape: 3-way join + grouped revenue + top-10. Customer side "
    "is broadcast (small after segment filter); lineitem⋈orders shuffles on the key.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg"),
    doc="TPC-H Q5 shape: 6-table join with a compound join condition. All four "
    "dimensions broadcast; only lineitem⋈orders shuffles.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "broadcast_dim_join",
    oracle="""
        SELECT p_brand,
               COUNT(*) AS n_items,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
        GROUP BY p_brand
    """,
    tags=("join", "agg", "broadcast"),
    doc="Fact ⋈ broadcast(dim): the canonical star-schema pattern — the filtered "
    "part dimension ships to every executor, lineitem never shuffles before the agg.",
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "semi_join_customers",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
        )
    """,
    tags=("join", "semi"),
    doc="Left-semi join (EXISTS): only the right side's key column flows, no row "
    "duplication from multiple matches.",
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_customers",
    oracle="""
        -- NOT EXISTS, not NOT IN: the Spark side is left_anti, and the
        -- two diverge whenever the subquery column holds a NULL (NOT IN
        -- returns nothing; NOT EXISTS still returns unmatched rows)
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
    doc="Left-anti join (NOT EXISTS): customers that never ordered.",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "outer_join_nation_customers",
    oracle="""
        SELECT n_name,
               COUNT(c_custkey) AS n_customers,
               ROUND(COALESCE(SUM(c_acctbal), 0.0), 2) AS sum_bal
        FROM nation
        LEFT JOIN customer ON n_nationkey = c_nationkey AND c_acctbal > 4000.0
        GROUP BY n_name
    """,
    tags=("join", "outer"),
    doc="Left-outer join with an extra join-side predicate: nations keep a row "
    "even with zero qualifying customers (COUNT(col) skips nulls).",
)
def outer_join_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        n.join(c, (n.n_nationkey == c.c_nationkey) & (c.c_acctbal > 4000.0), "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("sum_bal"),
        )
    )


@register(
    "range_band_join",
    oracle="""
        SELECT b.band, COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 6) AS avg_price
        FROM part
        JOIN (VALUES ('budget', 0.0, 1000.0),
                     ('mid', 1000.0, 1500.0),
                     ('premium', 1500.0, 100000.0)) AS b(band, lo, hi)
          ON p_retailprice >= b.lo AND p_retailprice < b.hi
        GROUP BY b.band
    """,
    tags=("join", "non-equi"),
    doc="Non-equi (range/theta) join against a tiny banding relation: planned as "
    "broadcast-nested-loop — correct strategy when one side is rows-small.",
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    bands = local_df(
        spark,
        [("budget", 0.0, 1000.0), ("mid", 1000.0, 1500.0), ("premium", 1500.0, 100000.0)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), F.round(F.avg("p_retailprice"), 6).alias("avg_price"))
    )


@register(
    "shuffle_hash_join_hint",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("join", "shuffle-hash", "hint"),
    doc="Fact-fact join forced to SHUFFLED HASH via hint: when neither side "
    "broadcasts, Spark defaults to sort-merge, but the downstream hash "
    "aggregate doesn't benefit from sorted output — SHJ skips both sorts "
    "and builds a hash map from the smaller (orders) side per partition. "
    "Right choice when the build side's partitions fit executor memory and "
    "output order is irrelevant; stay with SMJ when spill risk matters or "
    "a sort is needed anyway. Strategy asserted in tests/test_plans.py; "
    "result-preserving, oracle is the plain join.",
)
def shuffle_hash_join_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("o_orderstatus")
    )
