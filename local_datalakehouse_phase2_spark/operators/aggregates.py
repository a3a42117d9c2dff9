"""Aggregation operators: global, grouped, conditional, multi-dimensional.

Covers SURVEY.md §2.4 (A1-A6) plus the DISTINCT / rollup / cube /
grouping-sets surface scheduled in §2.11/§7 Phase 3. Reference
evidence: /root/reference/SPARK_ICEBERG_GUIDE.md:166,175-176,205
(global COUNT/SUM/AVG), :287-289 (GROUP BY hash aggregate), :336-340
(conditional pivot-style aggregate).

Scale notes: every groupBy here is a hash aggregate with map-side
partial aggregation (Catalyst default), so the shuffle carries one row
per (partition, group), not per input row. Doubles are ROUNDed at the
end for oracle stability (order-independent comparison); the rounding
is part of the query contract, not the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
    doc="Flagship: TPC-H Q1 pricing summary — filter → grouped multi-agg → sort "
    "(the guide's diagnostic shape, :287-289 + :336-340, at fact-table scale).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q6_revenue_change",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("agg", "filter"),
    doc="TPC-H Q6 shape: tight filter + single global SUM (A2/A6). All four "
    "predicates push into the parquet scan.",
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "group_agg_stats",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               ROUND(AVG(o_totalprice), 6) AS avg_price,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    tags=("agg",),
    doc="A1-A4/A6: grouped count/sum/avg/min/max over a filtered scan "
    "(guide :175-176,:205,:287-289).",
)
def group_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "conditional_agg",
    oracle="""
        SELECT CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS flag_a,
               CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS flag_n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS flag_r,
               COUNT(*) AS total
        FROM lineitem
    """,
    tags=("agg",),
    doc="A5 conditional pivot-style aggregate, the guide's delete-file census "
    "shape (SPARK_ICEBERG_GUIDE.md:336-340) applied to returnflag.",
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    def flag(v: str):  # noqa: ANN202
        return F.sum(F.when(F.col("l_returnflag") == v, 1).otherwise(0))
    return li.agg(
        flag("A").alias("flag_a"),
        flag("N").alias("flag_n"),
        flag("R").alias("flag_r"),
        F.count("*").alias("total"),
    )


@register(
    "distinct_counts",
    oracle="""
        SELECT COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(DISTINCT l_returnflag) AS n_flags
        FROM lineitem
    """,
    tags=("agg", "distinct"),
    doc="COUNT(DISTINCT) surface (§2.4 note): Catalyst expands to a two-phase "
    "aggregate; at scale approx_count_distinct (see approx_distinct_counts) avoids the expand.",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


@register(
    "approx_distinct_counts",
    # HLL sketch values are engine-specific, so the oracle checks what IS
    # engine-independent: the exact cardinalities, plus the deterministic
    # claim that Spark's HLL++ at rsd=0.01 landed within 5% of them
    # (5x the configured error — HLL is deterministic on fixed data, so
    # this is a stable fact of the fixture, not a flaky bound).
    oracle="""
        SELECT COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               TRUE AS parts_within_5pct,
               TRUE AS orders_within_5pct
        FROM lineitem
    """,
    tags=("agg", "distinct", "approx"),
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-scale substitute for "
    "exact distinct — single pass, fixed memory, no expand. The query emits the "
    "exact counts alongside within-bound flags for the sketch estimates so the "
    "approximate path stays oracle-checked.",
)
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    est = li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    within = lambda a, e: (F.abs(F.col(a) - F.col(e)) / F.col(e) <= 0.05)  # noqa: E731
    return est.select(
        "n_parts",
        "n_orders",
        within("approx_parts", "n_parts").alias("parts_within_5pct"),
        within("approx_orders", "n_orders").alias("orders_within_5pct"),
    )


@register(
    "rollup_agg",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
    doc="ROLLUP hierarchy totals (§2.4 gap noted in SURVEY; built-in Catalyst Expand).",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "cube_agg",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
    doc="CUBE over two dimensions — all 4 grouping sets in one pass.",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price")
    )


@register(
    "grouping_sets_agg",
    oracle="""
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    tags=("agg", "grouping-sets"),
    doc="Explicit GROUPING SETS: two independent group-bys answered in one shuffle.",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # unique view name: registering plain "customer" would clobber any
    # same-named temp view the shared session already holds
    c.createOrReplaceTempView("__gs_customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS sum_bal
        FROM __gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@register(
    "percentile_stats",
    oracle="""
        SELECT l_returnflag,
               ROUND(MEDIAN(l_quantity), 6) AS med_qty,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 6) AS p95_price,
               ROUND(QUANTILE_CONT(l_discount, 0.25), 6) AS p25_disc
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("agg", "percentile", "median"),
    doc="EXACT median / interpolated percentiles per group (Spark `median` "
    "and `percentile` = SQL percentile_cont semantics, matching DuckDB's "
    "MEDIAN/QUANTILE_CONT): both engines sort the group and apply the same "
    "p*(n-1) linear interpolation, so results agree bit-for-bit on the "
    "fixture's integer-valued doubles. Exact percentiles shuffle the full "
    "value set per group; at 100 TB swap in approx_percentile (t-digest, "
    "mergeable partials, bounded memory) and accept the documented error "
    "bound — the approximate twin is exercised in approx_distinct_counts' "
    "family of sketches.",
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 6).alias("med_qty"),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95_price"),
            F.round(F.percentile("l_discount", F.lit(0.25)), 6).alias("p25_disc"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "dispersion_stats",
    oracle="""
        SELECT o_orderstatus,
               ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd_price,
               ROUND(VAR_SAMP(o_totalprice), 1) AS var_price,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("agg", "stddev", "variance"),
    doc="Sample stddev/variance per group. Both engines merge partial "
    "(count, mean, M2) states (Chan/Welford), but partial ORDER differs — "
    "Spark merges 32 shuffled partials, DuckDB scans sequentially — so "
    "agreement is only to float precision: ROUND absorbs the ~1e-9 "
    "relative drift. Variance of ~1e5-scale prices is ~1e9, hence the "
    "coarser 1-decimal round there.",
)
def dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
            F.round(F.var_samp("o_totalprice"), 1).alias("var_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "pivot_returnflag_revenue",
    oracle="""
        SELECT o_orderpriority,
               ROUND(SUM(CASE WHEN l_returnflag = 'A'
                              THEN l_extendedprice * (1 - l_discount) END), 2) AS A,
               ROUND(SUM(CASE WHEN l_returnflag = 'N'
                              THEN l_extendedprice * (1 - l_discount) END), 2) AS N,
               ROUND(SUM(CASE WHEN l_returnflag = 'R'
                              THEN l_extendedprice * (1 - l_discount) END), 2) AS R
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("agg", "pivot"),
    doc="PIVOT: revenue matrix priority x returnflag. The pivot values are "
    "DECLARED (['A','N','R']), not discovered — discovery costs an extra "
    "distinct pass over the fact table and makes the output schema "
    "data-dependent, both wrong at 100 TB. Catalyst rewrites declared "
    "pivots into exactly the oracle's conditional aggregates: one shuffle, "
    "partial aggregation intact.",
)
def pivot_returnflag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum(rev), 2))
        .orderBy("o_orderpriority")
    )


@register(
    "unpivot_part_measures",
    oracle="""
        SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE)
        FROM part
    """,
    tags=("agg", "unpivot", "setop"),
    doc="UNPIVOT (melt): wide part measures to long (key, measure, value) "
    "triples — the normalization step before per-measure windowing or "
    "sketching. Narrow-side equivalent of the oracle's UNION ALL but "
    "single-scan: Expand emits both rows per input row in one pass instead "
    "of scanning part twice.",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("double").alias("p_size")
    )
    return p.unpivot("p_partkey", ["p_retailprice", "p_size"], "measure", "value")


@register(
    "approx_percentile_stats",
    # Sketch estimates are engine-specific, but their RANK error bound is
    # not: approx_percentile(accuracy=1000) guarantees the returned
    # element's rank is within ~1/1000 of the target. The query measures
    # the achieved rank of each estimate with a second aggregate pass and
    # emits within-tolerance flags (0.01 = 10x the configured bound,
    # deterministic on fixed data) alongside the exact group counts.
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               TRUE AS p50_rank_ok,
               TRUE AS p95_rank_ok
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("agg", "percentile", "approx", "sketch"),
    doc="approx_percentile (t-digest-style sketch): the 100 TB path the "
    "exact percentile_stats documents — mergeable partial sketches, "
    "bounded memory, one pass, no full-value-set shuffle. accuracy=1000 "
    "bounds rank error at ~1/1000; the query re-measures each estimate's "
    "achieved rank and emits within-tolerance flags so the sketch path is "
    "oracle-checked without comparing engine-specific sketch internals.",
)
def approx_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    est = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("p50_est"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(1000)).alias("p95_est"),
    )
    # second pass: the achieved rank of each estimate within its group
    ranked = li.join(F.broadcast(est), "l_returnflag").groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.avg((F.col("l_extendedprice") <= F.col("p50_est")).cast("int")).alias("r50"),
        F.avg((F.col("l_extendedprice") <= F.col("p95_est")).cast("int")).alias("r95"),
    )
    return ranked.select(
        "l_returnflag",
        "n_rows",
        (F.abs(F.col("r50") - 0.5) <= 0.01).alias("p50_rank_ok"),
        (F.abs(F.col("r95") - 0.95) <= 0.01).alias("p95_rank_ok"),
    ).orderBy("l_returnflag")


@register(
    "rollup_grouping_id",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup", "grouping"),
    doc="GROUPING() disambiguation over ROLLUP: distinguishes a NULL that "
    "IS a group value from the NULL meaning 'all values' in subtotal "
    "rows — without it rollup output is ambiguous whenever the grouped "
    "column itself contains nulls.",
)
def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count("*").alias("n_orders"),
    )
