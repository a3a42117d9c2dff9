"""Streaming ingest into the lakehouse: exactly-once micro-batch
appends (streaming/ingest.py).

Covers the contract the Iceberg streaming sink provides in the
reference stack: (1) a file-source stream drains into snapshot
commits, (2) incremental runs pick up only new files, (3) a replayed
micro-batch (at-least-once foreachBatch) is a no-op instead of
duplicate rows, and (4) every stream commit records its batch-id
watermark in the snapshot log.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import Lakehouse
from local_datalakehouse_phase2_spark.streaming.ingest import (
    STREAM_BATCH_KEY,
    append_stream_batch,
    last_committed_batch,
    stream_into_table,
)


@pytest.fixture()
def lake(spark, tmp_path) -> Lakehouse:
    lk = Lakehouse(spark, str(tmp_path / "wh"))
    lk.create_namespace("lab")
    return lk


def _feed(spark, src_dir: str, lo: int, hi: int) -> None:
    spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    ).coalesce(1).write.mode("append").parquet(src_dir)


def test_stream_drains_into_snapshots_and_resumes(spark, lake, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = lake.create_table("lab.ingest", schema="k bigint, v string")

    _feed(spark, src, 0, 50)
    stream = spark.readStream.schema("k bigint, v string").parquet(src)
    q = stream_into_table(stream, t, ckpt, query_name="ingest-test")
    q.awaitTermination(120)
    assert t.read().count() == 50
    ops = [e.operation for e in t.log.entries()]
    assert ops[0] == "create" and "append" in ops

    # second run drains ONLY the new file (checkpoint carries offsets)
    _feed(spark, src, 50, 80)
    q2 = stream_into_table(
        spark.readStream.schema("k bigint, v string").parquet(src), t, ckpt,
        query_name="ingest-test",
    )
    q2.awaitTermination(120)
    assert t.read().count() == 80
    assert sorted(r.k for r in t.read().collect()) == list(range(80))
    # batch-id watermark recorded in the log
    assert last_committed_batch(t, "ingest-test") is not None
    marked = [e for e in t.log.entries() if e.extra and STREAM_BATCH_KEY in e.extra]
    assert len(marked) >= 2


def test_stream_into_branch_then_merge(spark, lake, tmp_path):
    """Nessie audit-branch ingestion: the stream lands on a branch
    (invisible on main), then merge_branch publishes everything at
    once — write-audit-publish at stream granularity."""
    from local_datalakehouse_phase2_spark.lakehouse import merge_branch

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = lake.create_table("lab.bring", schema="k bigint, v string")
    t.append(
        spark.createDataFrame([(999, "base")], "k bigint, v string")
    )
    t.create_branch("ingest")

    _feed(spark, src, 0, 30)
    q = stream_into_table(
        spark.readStream.schema("k bigint, v string").parquet(src),
        t,
        ckpt,
        query_name="branch-ingest",
        ref="ingest",
    )
    q.awaitTermination(120)
    assert t.read().count() == 1  # main untouched
    assert t.read(ref="ingest").count() == 31

    merge_branch(t, "ingest")
    assert t.read().count() == 31
    assert sorted(r.k for r in t.read().collect())[:3] == [0, 1, 2]


def test_replayed_batch_is_noop(spark, lake):
    t = lake.create_table("lab.replay", schema="k bigint, v string")
    batch = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit("x").alias("v")
    )
    assert append_stream_batch(t, batch, 0, "q1") is True
    assert t.read().count() == 10
    # at-least-once replay of the same epoch: must not duplicate
    assert append_stream_batch(t, batch, 0, "q1") is False
    assert t.read().count() == 10
    # a LATER batch commits fine
    assert append_stream_batch(t, batch, 1, "q1") is True
    assert t.read().count() == 20
    # a different query id has its own watermark
    assert append_stream_batch(t, batch, 0, "q2") is True
    assert t.read().count() == 30


def test_stream_upsert_merges_and_replays_safely(spark, lake, tmp_path):
    from local_datalakehouse_phase2_spark.streaming.ingest import (
        merge_stream_batch,
        stream_upsert_into_table,
    )

    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    t = lake.create_table("lab.cdc", schema="k bigint, v string")

    def feed(lo, hi, tag):
        spark.range(lo, hi).select(
            F.col("id").alias("k"), F.concat(F.lit(tag), F.col("id")).alias("v")
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = stream_upsert_into_table(
            spark.readStream.schema("k bigint, v string").parquet(src),
            t, ckpt, key_cols=["k"], query_name="cdc-test",
        )
        q.awaitTermination(120)

    feed(0, 40, "v")
    drain()
    assert t.read().count() == 40
    feed(20, 60, "u")
    drain()
    # matched keys replaced, new keys inserted, low keys untouched
    assert t.read().count() == 60
    got = {r.k: r.v for r in t.read().collect()}
    assert got[10] == "v10" and got[25] == "u25" and got[59] == "u59"
    # replayed epoch: no-op even though the merge itself would mutate
    batch = spark.createDataFrame([(10, "SHOULD_NOT_LAND")], "k bigint, v string")
    assert merge_stream_batch(t, batch, 0, "cdc-test", ["k"]) is False
    assert t.read().filter("k = 10").first().v == "v10"
    # later epoch applies
    assert merge_stream_batch(t, batch, 99, "cdc-test", ["k"]) is True
    assert t.read().filter("k = 10").first().v == "SHOULD_NOT_LAND"
    assert t.read().count() == 60


def test_stream_upsert_dedupes_within_batch(spark, lake):
    from local_datalakehouse_phase2_spark.streaming.ingest import merge_stream_batch

    t = lake.create_table("lab.dd", schema="k bigint, v string")
    t.append(spark.createDataFrame([(1, "old")], "k bigint, v string"))
    # one key per batch is the sink contract; merge_stream_batch trusts
    # its caller, stream_upsert_into_table enforces via dropDuplicates —
    # simulate that path
    dup = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k bigint, v string")
    assert merge_stream_batch(t, dup.dropDuplicates(["k"]), 0, "q", ["k"]) is True
    assert t.read().count() == 2


def test_apply_cdc_batch_last_wins_ordering(spark, tmp_path):
    """Within one epoch, seq_col decides per key: update-then-delete
    deletes; delete-then-(re)insert survives with the newest row."""
    from local_datalakehouse_phase2_spark.lakehouse import Lakehouse
    from local_datalakehouse_phase2_spark.streaming.ingest import apply_cdc_batch

    lake = Lakehouse(spark, str(tmp_path / "wh"))
    lake.create_namespace("lab")
    t = lake.create_table("lab.cdcord", schema="k bigint, v string")
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"))
    ev = "k bigint, v string, op string, seq bigint"
    batch = spark.createDataFrame(
        [
            (1, "a2", "U", 1), (1, None, "D", 2),   # U then D -> gone
            (2, None, "D", 1), (2, "b2", "U", 2),   # D then U -> newest wins
            (4, None, "D", 1), (4, "d", "I", 2),    # D then I on new key -> inserted
        ],
        ev,
    )
    assert apply_cdc_batch(t, batch, batch_id=0, query_id="q", key_cols=["k"], seq_col="seq")
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [(2, "b2"), (3, "c"), (4, "d")]
    # replay of the same epoch: no-op
    assert not apply_cdc_batch(t, batch, batch_id=0, query_id="q", key_cols=["k"], seq_col="seq")
    assert sorted((r.k, r.v) for r in t.read().collect()) == got
