"""Fastwrite multi-file partitioning parity (r15, VERDICT item 7).

`repartition(n, cols)` over a LocalRelation stays on the driver-side
fast path: fastwrite.spark_partition_ids reproduces Spark's
HashPartitioning id (Murmur3_x86_32 seed 42, chained per column, pmod)
BIT-exactly, so the fast path's row->file placement equals the Spark
writer's — these tests are the parity oracle that keeps that claim
honest across Spark upgrades.
"""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from local_datalakehouse_phase2_spark.lakehouse import Lakehouse, fastwrite
from local_datalakehouse_phase2_spark.localrows import local_df


def test_murmur3_parity_with_spark_hash(spark):
    """spark_partition_ids == pmod(hash(cols), n) computed by Spark
    itself, over randomized ints/longs/strings/bools/dates with nulls,
    single- and multi-column, two modulus values."""
    rng = random.Random(42)
    rows = []
    for i in range(200):
        rows.append(
            (
                rng.randrange(-(2**31), 2**31),
                rng.randrange(-(2**63), 2**63),
                None
                if i % 17 == 0
                else "".join(
                    chr(rng.randrange(32, 0x2FF)) for _ in range(rng.randrange(0, 12))
                ),
                rng.random() < 0.5,
                datetime.date(1970, 1, 1)
                + datetime.timedelta(days=rng.randrange(-20000, 20000)),
                None if i % 11 == 0 else rng.randrange(-(2**63), 2**63),
            )
        )
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("d", T.DateType()),
            T.StructField("ln", T.LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    for n in (4, 7):
        for cols in (["l"], ["s"], ["i", "l", "s", "b", "d", "ln"]):
            expect = [
                r[0]
                for r in df.select(
                    F.expr(f"pmod(hash({','.join(cols)}), {n})")
                ).collect()
            ]
            got = fastwrite.spark_partition_ids(
                [Row(*r) for r in rows], schema, cols, n
            )
            assert got == expect, (cols, n)


def test_unsupported_key_type_declines(spark):
    schema = T.StructType([T.StructField("f", T.DoubleType())])
    assert (
        fastwrite.spark_partition_ids([Row(1.5)], schema, ["f"], 4) is None
    )
    assert (
        fastwrite.spark_partition_ids([Row(1.5)], schema, ["missing"], 4) is None
    )


def test_repartitioned_append_matches_spark_writer(spark, tmp_path):
    """End-to-end: appending local.repartition(4, key) through the fast
    path produces the same file COUNT and the same per-file row SETS as
    the Spark writer fed identical (scan-backed) rows."""
    rows = [(i, f"name{i}") for i in range(25)]

    def build(name, frame):
        lake = Lakehouse(spark, str(tmp_path / name))
        lake.create_namespace("lab")
        t = lake.create_table("lab.n", schema="k bigint, v string")
        t.append(frame)
        import duckdb
        import os

        out = []
        for p in sorted(fi.path for fi in t.log.state_at().values()):
            vals = duckdb.sql(
                f"SELECT * FROM read_parquet('{os.path.join(t.table_dir, p)}')"
            ).fetchall()
            out.append(sorted(vals))
        return sorted(out)

    fast = build(
        "fast", local_df(spark, rows, "k bigint, v string").repartition(4, "k")
    )
    via_spark = build(
        "spark", spark.createDataFrame(rows, "k long, v string").repartition(4, "k")
    )
    assert len(fast) == 4 and fast == via_spark


def test_computed_key_falls_back_to_spark_writer(spark, tmp_path):
    """A computed partition expression must decline the fast path (we
    only reproduce plain-column hashing) — and still write correctly
    through the Spark writer."""
    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    t = lake.create_table("lab.n", schema="k bigint, v string")
    frame = local_df(
        spark, [(i, f"n{i}") for i in range(10)], "k bigint, v string"
    ).repartition(3, (F.col("k") % 2).alias("e"))
    t.append(frame)
    assert t.read().count() == 10


def test_repartition_without_n_falls_back(spark, tmp_path):
    """repartition(cols) with NO explicit n is AQE-coalescible — the
    Spark writer may legally merge partitions at runtime, so the fast
    path must decline rather than emulate a file count Spark wouldn't
    produce."""
    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    t = lake.create_table("lab.n", schema="k bigint, v string")
    frame = local_df(
        spark, [(i, f"n{i}") for i in range(10)], "k bigint, v string"
    ).repartition("k")
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().nextJobId()
    t.append(frame)
    after = sc._jsc.sc().dagScheduler().nextJobId()
    assert after > before  # Spark writer ran (fast path declined)
    assert t.read().count() == 10
