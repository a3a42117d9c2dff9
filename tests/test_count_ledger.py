"""Deferred-count ledger + fixture localization (maintenance_queries).

The ledger's claim is snapshot isolation: a `lake.read()` captured at
step N counts step-N rows even when the count job runs after later
commits, compactions, or rollbacks. These tests pin that claim with
interleaved mutations that WOULD change the counts if deferral ever
re-resolved state late.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import Lakehouse
from local_datalakehouse_phase2_spark.lakehouse.maintenance import (
    rewrite_data_files,
    rollback_to_snapshot,
)
from local_datalakehouse_phase2_spark.localrows import local_df
from local_datalakehouse_phase2_spark.operators.maintenance_queries import (
    _CountLedger,
    _localize,
    _nrows,
)


@pytest.fixture()
def lake(spark, tmp_path):
    lh = Lakehouse(spark, str(tmp_path / "wh"))
    lh.create_namespace("lg")
    return lh


def _rows(n, tag="x"):
    return [(i, f"{tag}{i}") for i in range(n)]


DDL = "k bigint, v string"


def test_deferred_counts_see_the_captured_snapshot(spark, lake):
    led = _CountLedger()
    t = lake.create_table("lg.t", schema=DDL)
    t.append(local_df(spark, _rows(5), DDL))
    (n1,) = led.counts(t.read())
    t.append(local_df(spark, _rows(7, "y"), DDL))
    (n2,) = led.counts(t.read())
    t.overwrite(local_df(spark, _rows(2, "z"), DDL))
    (n3,) = led.counts(t.read())
    # counts resolve AFTER the overwrite replaced everything
    [(a, b, c)] = led.resolve([(n1, n2, n3)])
    assert (a, b, c) == (5, 12, 2)


def test_deferred_counts_survive_compaction_and_rollback(spark, lake):
    led = _CountLedger()
    t = lake.create_table("lg.c", schema=DDL)
    t.append(local_df(spark, _rows(10), DDL).repartition(4, "k"))
    t.append(local_df(spark, _rows(6, "y"), DDL).repartition(4, "k"))
    pre = led.counts(t.read())[0]
    # compaction logically replaces every small file; the captured plan
    # still reads the original bytes (orphan sweep is the only deleter)
    rewrite_data_files(t, target_file_size_bytes=1 << 28)
    post_compact = led.counts(t.read())[0]
    rollback_to_snapshot(t, 2)
    post_rb = led.counts(t.read())[0]
    [(x, y, z)] = led.resolve([(pre, post_compact, post_rb)])
    assert (x, y, z) == (16, 16, 16)
    # and a genuinely state-changing rollback target
    rollback_to_snapshot(t, 1)
    assert t.read().count() == 10


def test_ledger_mixes_literals_and_slots_preserving_positions(spark, lake):
    led = _CountLedger()
    t = lake.create_table("lg.m", schema=DDL)
    t.append(local_df(spark, _rows(3), DDL))
    (n,) = led.counts(t.read())
    rows = [("step", 42, n, "detail"), ("other", n, -1, "d2")]
    out = led.resolve(rows)
    assert out == [("step", 42, 3, "detail"), ("other", 3, -1, "d2")]


def test_empty_ledger_resolves_without_a_job(spark):
    led = _CountLedger()
    assert led.resolve([("a", 1)]) == [("a", 1)]


def test_localize_preserves_values_and_schema(spark, sf_oracle):
    src = spark.read.parquet(f"{sf_oracle}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    loc = _localize(src)
    assert loc.schema == src.schema
    assert sorted(map(tuple, loc.collect())) == sorted(map(tuple, src.collect()))
    # and it actually became a LocalRelation (the fast-write gate)
    plan = loc._jdf.queryExecution().optimizedPlan()
    assert plan.getClass().getSimpleName() == "LocalRelation"


def test_localize_leaves_large_frames_alone(spark, sf_oracle):
    big = spark.read.parquet(f"{sf_oracle}/orders.parquet")
    assert _localize(big) is big


def test_nrows_matches_individual_counts(spark, sf_oracle):
    n = spark.read.parquet(f"{sf_oracle}/nation.parquet")
    r = spark.read.parquet(f"{sf_oracle}/region.parquet")
    got = _nrows(n, r, n.filter(F.col("n_nationkey") < 5))
    assert got == (n.count(), r.count(), 5)


def test_clean_snapshot_counts_run_zero_jobs(spark, tmp_path):
    """r16 plan-gate analog for the ledger: counting clean snapshot
    reads resolves from the manifest-exact tag — zero Spark jobs in
    the job group — while a derived frame still pays exactly one."""
    from local_datalakehouse_phase2_spark.lakehouse import Lakehouse
    from local_datalakehouse_phase2_spark.localrows import local_df
    from local_datalakehouse_phase2_spark.operators.maintenance_queries import (
        _CountLedger,
    )

    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    t = lake.create_table("lab.t", schema="k bigint, v string")
    t.append(local_df(spark, [(i, f"v{i}") for i in range(7)], "k bigint, v string"))

    led = _CountLedger()
    slots = led.counts(t.read(), t.read())
    sc = spark.sparkContext
    sc.setJobGroup("ledger-zero-jobs", "clean snapshot counts")
    try:
        rows = led.resolve([tuple(slots)])
    finally:
        sc.setJobGroup(None, None)
    assert rows == [(7, 7)]
    assert list(sc.statusTracker().getJobIdsForGroup("ledger-zero-jobs")) == []

    # a DERIVED frame (filter) loses the tag: one union job, right answer
    led2 = _CountLedger()
    (slot,) = led2.counts(t.read().filter("k < 3"))
    sc.setJobGroup("ledger-one-job", "derived frame count")
    try:
        rows = led2.resolve([(slot,)])
    finally:
        sc.setJobGroup(None, None)
    assert rows == [(3,)]
    assert len(list(sc.statusTracker().getJobIdsForGroup("ledger-one-job"))) >= 1
