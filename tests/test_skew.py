"""Skew-mitigation operators: result preservation + routing shape.

The salting rewrites must be invisible in results (their DuckDB
oracles are the plain unsalted SQL — covered in test_oracle_diff) and
visible in routing: the salt column must actually spread hot keys
across buckets before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.operators.skew import (
    DEFAULT_SALT,
    salt_column,
    salted_equi_join,
    two_stage_agg,
)
from local_datalakehouse_phase2_spark.sources.loaders import load_table


def test_salt_column_is_deterministic_and_bounded(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").limit(1000)
    s1 = li.select(salt_column(8, "l_orderkey", "l_linenumber").alias("s"))
    lo, hi, n = s1.agg(F.min("s"), F.max("s"), F.count_distinct("s")).first()
    assert 0 <= lo and hi <= 7
    assert n > 1  # actually spreads
    # same inputs -> same salts (no rand() anywhere)
    assert s1.collect() == li.select(
        salt_column(8, "l_orderkey", "l_linenumber").alias("s")
    ).collect()


def test_salted_join_equals_plain_join(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    p = load_table(spark, sf_small, "part").select("p_partkey", "p_brand")
    salted = salted_equi_join(
        li, p, "l_partkey", "p_partkey", fact_unique=["l_orderkey", "l_linenumber"]
    )
    plain = li.join(p, li.l_partkey == p.p_partkey)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert "__salt" not in salted.columns


def test_two_stage_agg_spreads_hot_groups(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    salt = salt_column(DEFAULT_SALT, "l_orderkey", "l_linenumber")
    # stage-1 cardinality is (groups x salts): the hot key is split
    stage1_groups = (
        li.withColumn("__salt", salt).groupBy("l_returnflag", "__salt").count().count()
    )
    n_flags = li.select("l_returnflag").distinct().count()
    assert stage1_groups > n_flags  # more partial groups than final groups
    out = two_stage_agg(
        li,
        group_cols=["l_returnflag"],
        aggs={"total": ("sum", "l_quantity"), "cnt": ("count", "l_orderkey")},
        salt=salt,
    )
    expected = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total"), F.count("l_orderkey").alias("cnt")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expected.collect()))


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling must actually trigger: a join where one
    key holds ~all left rows gets its oversized partition split at
    runtime (skew=true in the final adaptive plan). This is the
    automatic complement to the manual salting operators above."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "262144",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 400_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 1 ELSE id END AS k",  # ~90% on key 1
            "id AS payload",
        )
        right = spark.range(0, 50_000).selectExpr("id AS k", "id AS r_payload")
        joined = left.join(right, "k")
        # materialize THIS frame's own QueryExecution (count() would build
        # a new one and the inspected plan would never finalize)
        joined.toPandas()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
