"""Set operations: UNION ALL, UNION DISTINCT, INTERSECT, EXCEPT.

SURVEY.md §2.7 gap — absent from the reference runbook, built-in to
its engines; implemented per the north star. Spark's intersect/except
are DISTINCT-semantics (like SQL), union is ALL-semantics (like SQL
UNION ALL) — the oracles spell this out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table


@register(
    "union_all_segments",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal < 0
    """,
    tags=("setop",),
    doc="UNION ALL keeps duplicates (a BUILDING customer with negative balance appears twice).",
)
def union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") < 0).select("c_custkey", "c_mktsegment")
    return a.union(b)


@register(
    "union_distinct_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "distinct"),
    doc="UNION DISTINCT: nation keys present among customers or suppliers, deduped.",
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "intersect_active_buyers",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
    doc="INTERSECT (distinct): customers with both open and finished orders.",
)
def intersect_active_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    fin = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_.intersect(fin)


@register(
    "except_inactive_parts",
    oracle="""
        SELECT p_partkey AS partkey FROM part
        EXCEPT
        SELECT l_partkey AS partkey FROM lineitem
    """,
    tags=("setop",),
    doc="EXCEPT (distinct): parts never shipped in any lineitem.",
)
def except_inactive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    # subtract IS set-semantics EXCEPT; exceptAll().distinct() would
    # diverge from the oracle whenever the left side carried duplicates
    # (2 copies minus 1 occurrence leaves a survivor EXCEPT excludes)
    return p.subtract(li)


@register(
    "except_all_multiplicity",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus <> 'P'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY custkey
    """,
    tags=("setop", "bag-semantics"),
    doc="EXCEPT ALL (bag semantics): multiset difference of order "
    "occurrences — a customer with 3 non-pending orders and 1 finalized "
    "keeps 2 rows, where distinct EXCEPT would collapse to membership. "
    "Planned as a count-and-replicate aggregate, one shuffle on the key.",
)
def except_all_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") != "P").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b).orderBy("custkey")


@register(
    "intersect_all_multiplicity",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY custkey
    """,
    tags=("setop", "bag-semantics"),
    doc="INTERSECT ALL: per-key multiplicity is min(count_left, "
    "count_right) — customers appear once per matched open/finalized "
    "order pair, not once per membership.",
)
def intersect_all_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b).orderBy("custkey")
