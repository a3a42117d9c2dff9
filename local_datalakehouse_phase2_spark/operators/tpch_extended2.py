"""Remaining TPC-H query shapes (q2, q11, q12, q16, q20, q21).

Completes the TPC-H-shaped coverage started in tpch_extended.py — the
reference's runbook never joins (SURVEY.md §2.3), but its configured
engines support the full relational surface, so per the north star we
exercise every TPC-H plan shape over the driver fixtures. This module
adds the six shapes the first module left out:

- q2:  correlated MIN subquery (min-cost supplier argmin) decorrelated
  into a per-key aggregate + equality join back
- q11: HAVING against a global scalar subquery over the same derived
  relation (computed once, broadcast as one row)
- q12: dual conditional aggregate over a fact-fact join
- q16: COUNT(DISTINCT) + NOT IN anti join + multi-column grouping
- q20: nested IN subqueries (semi joins) with a grouped-HAVING inner
  threshold
- q21: EXISTS + NOT EXISTS self-joins on the same fact table with a
  non-equi residual (the hardest decorrelation shape in TPC-H)

Fixture adaptations (no partsupp, l_commitdate/l_receiptdate,
l_shipmode, c_phone): lineitem doubles as the part-supplier bridge
(supplycost := min observed unit price; availqty := total supplied
quantity); "late" := shipped > 60 days after the order date. The PLAN
SHAPES — what engine coverage is about — are unchanged.

Numeric stability vs the DuckDB oracle: thresholds compare
integer-valued doubles (quantity sums) or identical per-row doubles
(unit prices), never order-dependent float sums, so strict
inequalities are deterministic in both engines; displayed double sums
are ROUNDed per the registry convention.

Scale notes (100 TB): every dimension side broadcasts; scalar
subqueries flow back as one-row broadcasts (never a driver collect);
q21's EXISTS/NOT-EXISTS both shuffle only (orderkey, suppkey) pairs,
not full lineitem rows.

Reference parity: joins/subqueries are capabilities of the stack the
reference configures (Spark 3.5 `docker-compose.yml:77`, Trino 476
`docker-compose.yml:62`) that its runbook never exercises — see
SURVEY.md §2.3/§2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS supplycost
            FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
               ROUND(supplycost, 2) AS min_cost
        FROM ps
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size = 3 AND r_name = 'ASIA'
          AND supplycost = (SELECT MIN(ps2.supplycost)
                            FROM ps ps2
                            JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                            JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
                            JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
                            WHERE ps2.l_partkey = p_partkey
                              AND r2.r_name = 'ASIA')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    tags=("join", "correlated-subquery", "argmin"),
    doc="TPC-H Q2 shape: cheapest supplier per part within a region via a "
    "correlated MIN subquery, decorrelated into a per-partkey aggregate "
    "joined back on (partkey, cost) equality. supplycost := min observed "
    "unit price from lineitem (fixture has no partsupp). The per-part min "
    "is computed over region-qualified pairs only — the part-size filter "
    "can't change which pairs exist per partkey, so filtering first is "
    "equivalent and shrinks every downstream side. Equality on doubles is "
    "safe: both engines compare the identical division results, never "
    "order-dependent sums.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 3)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # push the selective dimension filters THROUGH the aggregate as
    # broadcast semi-joins: only (part with p_size=3) x (ASIA supplier)
    # pairs survive the later joins, so aggregating anything else is
    # wasted shuffle — at warehouse scale this is the difference
    # between shuffling the whole fact table and ~0.4% of it
    li_pruned = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            F.broadcast(asia_supp.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
    )
    ps = li_pruned.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    ps_asia = ps.join(F.broadcast(asia_supp), ps.l_suppkey == F.col("s_suppkey")).join(
        F.broadcast(p.select("p_partkey", "p_type")), ps.l_partkey == F.col("p_partkey")
    )
    min_per_part = ps_asia.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("supplycost").alias("min_sc")
    )
    return (
        ps_asia.join(
            F.broadcast(min_per_part),
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("supplycost") == F.col("min_sc")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("supplycost", 2).alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_part_stock",
    oracle="""
        WITH supplied AS (
            SELECT l_partkey, l_quantity
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_4')
        SELECT l_partkey AS ps_partkey,
               ROUND(SUM(l_quantity), 2) AS part_value
        FROM supplied
        GROUP BY l_partkey
        HAVING SUM(l_quantity) > (SELECT 0.0005 * SUM(l_quantity) FROM supplied)
        ORDER BY part_value DESC, ps_partkey
    """,
    tags=("join", "having", "scalar-subquery", "agg"),
    doc="TPC-H Q11 shape: per-part share of one nation's supplied stock, "
    "kept only when above a fraction of the global total — a HAVING whose "
    "right side is a scalar subquery over the same derived relation. The "
    "total flows back as a one-row broadcast; the nation-filtered supplier "
    "set broadcasts into the fact scan. availqty := supplied quantity "
    "(fixture has no partsupp); quantity sums are integer-valued doubles, "
    "so the strict threshold comparison is exact in both engines.",
)
def q11_important_part_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    supplied = li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", "l_quantity"
    )
    total = supplied.agg((0.0005 * F.sum("l_quantity")).alias("threshold"))
    return (
        supplied.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("value"))
        .join(F.broadcast(total), F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("value", 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "q12_priority_shipping",
    oracle="""
        SELECT l_returnflag AS ship_class,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("join", "conditional-agg", "agg"),
    doc="TPC-H Q12 shape: fact-fact join + dual complementary conditional "
    "counts per group (l_returnflag stands in for the fixture-absent "
    "l_shipmode). The date filter prunes lineitem before the shuffle; only "
    "(orderkey, returnflag) vs (orderkey, priority) columns move.",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    ).select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
          AND p_size IN (1, 4, 7, 10)
          AND NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l_suppkey AND s.s_acctbal < 0.0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "anti", "count-distinct", "agg"),
    doc="TPC-H Q16 shape: supplier variety per (brand, type, size) with an "
    "excluded-supplier NOT IN (negative account balance stands in for the "
    "fixture-absent complaint comments) — planned as a broadcast anti join, "
    "then COUNT(DISTINCT) over a 3-column group. Catalyst expands the "
    "distinct into a two-phase aggregate (group+suppkey partial, then "
    "count) so the shuffle carries distinct pairs, not raw lineitems.",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_supplier_promotion",
    oracle="""
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE '%blue%')
              GROUP BY l_suppkey, l_partkey
              HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                               AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                              THEN l_quantity ELSE 0 END)
                     > 0.3 * SUM(l_quantity))
        ORDER BY s_name
    """,
    tags=("join", "semi", "having", "nested-subquery"),
    doc="TPC-H Q20 shape: nested IN subqueries — parts by name substring "
    "feed a per-(supplier, part) grouped HAVING, whose survivors feed a "
    "supplier semi join. Threshold: shipped >30% of that pair's all-time "
    "quantity in 1997 (availqty := all-time supplied quantity; fixture has "
    "no partsupp). Inner-to-outer both sides collapse to key sets before "
    "joining; quantity sums are integer-valued doubles so the threshold "
    "comparison is exact in both engines.",
)
def q20_excess_supplier_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    blue = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    in_1997 = (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00")) & (
        F.col("l_shipdate") < _ts("1998-01-01 00:00:00")
    )
    qualifying = (
        li.join(F.broadcast(blue), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0)).alias("y_qty"),
            F.sum("l_quantity").alias("t_qty"),
        )
        .filter(F.col("y_qty") > 0.3 * F.col("t_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    tags=("join", "semi", "anti", "self-join"),
    doc="TPC-H Q21 shape: suppliers solely responsible for late multi-"
    "supplier orders — EXISTS (another supplier on the order) + NOT EXISTS "
    "(another LATE supplier on the order), both correlated with a non-equi "
    "residual (suppkey <>), the hardest decorrelation in TPC-H. 'Late' := "
    "shipped >60 days after order date on a finalized order (fixture has "
    "no commit/receipt dates). r16: both quantifiers decorrelate into "
    "per-ORDER min/max/count aggregates (see the body), so the shuffles "
    "carry one pre-reduced row per order instead of raw (orderkey, "
    "suppkey) pairs through semi/anti joins. The original's status filter applies to "
    "l1's order only; l2/l3 share that orderkey, so folding it into `late` "
    "is equivalent.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    late = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    supp3 = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    # r16 rewrite (guide §2.3 "aggregate before you shuffle"): the
    # EXISTS / NOT EXISTS pair decorrelates into per-ORDER aggregates
    # instead of semi/anti self-joins that shuffle raw (orderkey,
    # suppkey) rows with sorts on both sides:
    #   EXISTS other-supplier      <=> the order has >= 2 distinct
    #       suppliers (l1's own supplier is on the order, so any
    #       second distinct one satisfies the <> residual);
    #   NOT EXISTS other-LATE-supp <=> the order has exactly ONE
    #       distinct late supplier — necessarily l1's own.
    # Under "exactly one late supplier" every late row of the order
    # belongs to that supplier, so numwait's per-order contribution is
    # the order's late-row COUNT — the count rides the same aggregate,
    # and `late` is computed ONCE (the semi/anti form re-planned it).
    # min/max stand in for distinct-count (keys are non-null); both
    # aggregates shrink map-side, so the shuffles carry one row per
    # order instead of one per lineitem, and the solo⋈multi join needs
    # no new exchange (both sides already hash-partitioned by
    # orderkey). Results identical — same DuckDB oracle, swept green.
    solo = (
        late.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("late_supp"),
            F.max("l_suppkey").alias("late_hi"),
            F.count("*").alias("n_late"),
        )
        .filter(F.col("late_supp") == F.col("late_hi"))
    )
    multi = (
        li.groupBy(F.col("l_orderkey").alias("k2"))
        .agg((F.min("l_suppkey") != F.max("l_suppkey")).alias("is_multi"))
        .filter(F.col("is_multi"))
    )
    return (
        solo.join(multi, solo.l_orderkey == F.col("k2"))
        .join(F.broadcast(supp3), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "lateral_order_top_line",
    oracle="""
        SELECT o_orderkey, li.max_price, li.n_lines
        FROM orders, LATERAL (
            SELECT MAX(l_extendedprice) AS max_price,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem
            WHERE l_orderkey = o_orderkey
        ) li
        WHERE o_custkey < 100
        ORDER BY o_orderkey
    """,
    tags=("join", "lateral", "correlated-subquery"),
    doc="Correlated LATERAL subquery: a per-order aggregate over its own "
    "lineitems, written as the SQL-standard lateral join. Catalyst "
    "decorrelates it into aggregate-then-join — same plan the manual "
    "rewrite would produce, so the per-row-subquery mental model costs "
    "nothing at scale. (Inner lateral over an aggregate always yields a "
    "row, so orders without lineitems still appear with n_lines=0 in "
    "BOTH engines.)",
)
def lateral_order_top_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, li.max_price, li.n_lines
        FROM orders, LATERAL (
            SELECT MAX(l_extendedprice) AS max_price,
                   COUNT(*) AS n_lines
            FROM lineitem
            WHERE l_orderkey = o_orderkey
        ) li
        WHERE o_custkey < 100
        ORDER BY o_orderkey
        """
    )
