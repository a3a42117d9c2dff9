"""Skew-mitigation operators: salted joins and two-stage aggregation.

At 100 TB a handful of hot keys turn one shuffle partition into the
whole job's critical path. AQE's skew-join splitting (enabled in our
session) handles moderate skew at runtime, but pathological keys —
a boilerplate document hashed by millions of rows, a null-ish default
user id — need the classic salting rewrites, which we expose as
reusable helpers and exercise as registered queries:

- `salted_equi_join`: replicate the small side SALT times, route each
  fact row to one replica by a DETERMINISTIC salt (xxhash64 of unique
  columns, never rand()); the join key becomes (key, salt) so a hot
  key spreads over SALT reducers.
- `two_stage_agg` (via `skew_salted_groupby`): aggregate on
  (key, salt) first — map-side partials spread hot keys across
  reducers — then combine the SALT partials per key. The classic
  hot-reducer fix for low-cardinality group keys.

Both rewrites are RESULT-PRESERVING: the salt only changes routing,
so each query's DuckDB oracle is the plain (unsalted) SQL — the
driver's hash check proves the rewrite changes nothing but the
physical distribution.

Salting is the manual fallback the reference's stack would get from
AQE too (Spark 3.5, /root/reference/docker-compose.yml:77); the
reference itself never joins (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table

DEFAULT_SALT = 8


def salt_column(n_buckets: int, *unique_cols: Column | str) -> Column:
    """Deterministic salt in [0, n_buckets): xxhash64 over columns that
    (together) identify the row. Deterministic beats rand(): retries,
    speculative tasks, and oracle comparisons all see the same routing."""
    return F.pmod(F.xxhash64(*unique_cols), F.lit(n_buckets)).cast("int")


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_unique: list[str],
    n_buckets: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on fact_key = dim_key, with the dim side replicated
    n_buckets times so hot fact keys fan out over n_buckets reducers.

    Use when dim is too big to broadcast AND fact keys are skewed.
    Replication multiplies the dim shuffle by n_buckets — keep
    n_buckets ≈ (hot-key rows / healthy-partition rows), not huge.

    Only fact-preserving join types are sound: the dim side is
    replicated n_buckets times, so 'right'/'full' would outer-preserve
    each unmatched dim row once PER REPLICA (n_buckets copies).
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_equi_join: join type {how!r} would duplicate unmatched "
            "dim rows once per salt replica; only inner/left/left_semi/"
            "left_anti are supported"
        )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
    )
    fact_s = fact.withColumn("__salt", salt_column(n_buckets, *fact_unique))
    joined = fact_s.join(
        dim_s,
        (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["__salt"] == dim_s["__salt"]),
        how,
    )
    return joined.drop(fact_s["__salt"]).drop(dim_s["__salt"])


def two_stage_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: Column,
    n_buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Skew-safe groupBy: stage 1 aggregates on (group_cols, salt) —
    hot groups split across n_buckets reducers — stage 2 merges the
    partials per group. `aggs` maps output name -> (fn, input col)
    with fn in {sum, count, min, max} (the re-aggregable functions;
    avg callers decompose into sum+count)."""
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(
            *[
                getattr(F, fn)(col).alias(name)
                for name, (fn, col) in aggs.items()
            ]
        )
    )
    return stage1.groupBy(*group_cols).agg(
        *[
            getattr(F, merge_fn[fn])(name).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


@register(
    "skew_salted_join",
    oracle="""
        SELECT p_brand, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS line_count
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 25
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    tags=("join", "skew", "salted"),
    doc="Salted fact⋈dim equi join (dim replicated 8x, fact routed by "
    "xxhash64(l_orderkey, l_linenumber) % 8) + revenue per brand. The salt "
    "only changes shuffle routing, so the oracle is the PLAIN join SQL — "
    "the hash match proves result preservation. In production reach for "
    "this when the dim side exceeds broadcast size and fact keys are "
    "pathologically hot (AQE skew-split handles the moderate cases).",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    joined = salted_equi_join(
        li,
        p.select("p_partkey", "p_brand"),
        fact_key="l_partkey",
        dim_key="p_partkey",
        fact_unique=["l_orderkey", "l_linenumber"],
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("line_count"),
        )
        .orderBy("p_brand")
    )


@register(
    "skew_salted_groupby",
    oracle="""
        SELECT l_returnflag, ROUND(SUM(l_extendedprice), 2) AS sum_price,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               ROUND(MAX(l_quantity), 2) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("agg", "skew", "salted"),
    doc="Two-stage salted aggregation over a 3-value group key "
    "(l_returnflag) — the extreme-skew shape where a plain groupBy funnels "
    "the whole table into 3 reducers. Stage 1 spreads each flag over 8 "
    "salt buckets; stage 2 merges 24 partial rows. Oracle is the plain "
    "GROUP BY: identical results, different physical distribution. (Spark's "
    "own partial aggregation makes the single-level plan safe for "
    "ALGEBRAIC aggregates; the two-stage form is the template for when "
    "stage 1 is itself expensive — collect_set, exact distinct — or when "
    "combiners are disabled.)",
)
def skew_salted_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = two_stage_agg(
        li,
        group_cols=["l_returnflag"],
        aggs={
            "sum_price": ("sum", "l_extendedprice"),
            "cnt": ("count", "l_linenumber"),
            "max_qty": ("max", "l_quantity"),
        },
        salt=salt_column(DEFAULT_SALT, "l_orderkey", "l_linenumber"),
    )
    return out.select(
        "l_returnflag",
        F.round("sum_price", 2).alias("sum_price"),
        "cnt",
        F.round("max_qty", 2).alias("max_qty"),
    ).orderBy("l_returnflag")
