"""Training-sequence shaping operators (operators/packing.py):
distributed prefix sum, chunk boundary math, packing placement, and
mixture-reweight feasibility arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.operators.packing import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    prefix_sum,
)


def test_prefix_sum_matches_naive(spark):
    rows = [(i * 3 % 97, (i * 7) % 13 + 1) for i in range(500)]  # shuffled keys
    df = spark.createDataFrame(
        [(k + 1000 * j, v) for j, (k, v) in enumerate(rows)], "k long, v long"
    )
    got = {r.k: r.ps for r in prefix_sum(df, "k", "v", "ps", partitions=7).collect()}
    ordered = sorted(((k + 1000 * j, v) for j, (k, v) in enumerate(rows)))
    acc, want = 0, {}
    for k, v in ordered:
        want[k] = acc
        acc += v
    assert got == want


def test_prefix_sum_bucket_id_is_row_pure(spark):
    """The r10 sf1 corruption regression: phase 2 (bucket totals) and
    phase 3 (in-bucket window) run as separate jobs, so the bucket id
    must be a pure function of the row. The old spark_partition_id()-
    over-repartitionByRange derivation gave the two jobs different
    range bounds at 50k rows (48k/50k rows mis-offset). Pin both the
    mechanism (no spark_partition_id in the plan) and the behavior
    (exact prefix at a row count where sampled bounds demonstrably
    jittered, across two runs)."""
    n = 50_000
    df = (
        spark.range(0, n)
        .repartition(32)  # round-robin layout, like the parallel_scan path
        .select(F.col("id").alias("k"), (F.pmod(F.col("id") * 7, 13) + 1).alias("v"))
    )
    out = prefix_sum(df, "k", "v", "ps", partitions=32)
    assert "spark_partition_id" not in out._jdf.queryExecution().analyzed().toString()
    expect, acc = {}, 0
    for k in range(n):
        expect[k] = acc
        acc += (k * 7) % 13 + 1
    for attempt in (1, 2):  # identical result across separate executions
        got = {r.k: r.ps for r in out.collect()}
        assert got == expect, f"attempt {attempt}"


def test_prefix_sum_never_single_partitions(spark):
    df = spark.range(0, 10000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    out = prefix_sum(df, "k", "v", "ps", partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window must be partitioned (hash/range exchange), never a
    # global sort into one partition (SinglePartition exchange)
    assert "SinglePartition" not in plan


def test_chunk_boundary_math(spark):
    # 100 tokens, window 64, stride 48 -> chunks at 0 (64 tok) and 48 (52)
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    w = F.expr("split(text, ' ')")
    n_chunks = (
        F.greatest(
            F.ceil((F.size(w) - F.lit(CHUNK_TOKENS)) / F.lit(float(CHUNK_STRIDE))),
            F.lit(0),
        ).cast("bigint")
        + 1
    )
    got = df.select(n_chunks.alias("n")).first().n
    assert got == 2
    short = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    assert short.select(n_chunks.alias("n")).first().n == 1
