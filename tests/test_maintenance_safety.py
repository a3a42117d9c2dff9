"""Failure-path safety of maintenance + ingest (round-6 hardening):

- rewrite_data_files must never leak staged-but-uncommitted outputs,
  whatever the failure (commit conflict OR a group's rewrite erroring),
  in both commit modes — leaked bytes would sit until the 24h orphan
  sweep, a full table's worth in the worst case.
- oversized lone files must compact regardless of min-input-files
  (Iceberg BinPack rewrites oversized files unconditionally).
- wap_id reuse is rejected at stage time (a duplicate would make
  publish_changes ambiguous and strand the loser's files).
- the exactly-once stream watermark honors the legacy bare-name key
  after the run-scoped upgrade (no double-commit of a replayed epoch).
- FileIO._strip_scheme leaves Windows drive prefixes alone.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import Lakehouse, rewrite_data_files
from local_datalakehouse_phase2_spark.lakehouse.fs import FileIO
from local_datalakehouse_phase2_spark.lakehouse.log import FileInfo
from local_datalakehouse_phase2_spark.lakehouse.maintenance import _plan_file_groups


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def _mk_rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit("v_"), F.col("id").cast("string")).alias("v")
    )


def _four_file_table(spark, lake, name):
    lake.create_namespace("lab", if_not_exists=True)
    t = lake.create_table(name)
    for i in range(4):
        t.append(_mk_rows(spark, i * 100, (i + 1) * 100).repartition(1))
    return t


def _two_file_groups(t):
    state = t.log.state_at()
    sizes = sorted((fi.size_bytes for fi in state.values()), reverse=True)
    return sizes[0] + sizes[1] + 1  # two files per group, never three


def _on_disk_equals_live(t):
    live = set(t.log.state_at().keys())
    # include files referenced by older snapshots (not yet expired)
    referenced = set()
    for v in t.log.versions():
        referenced.update(t.log.state_at(v).keys())
    on_disk = {
        t.io.relpath(p, t.table_dir)
        for p in t.io.walk_files(t.data_dir)
        # only data files count: _SUCCESS/.crc markers ride along with
        # every Spark write, live ones included
        if p.endswith(".parquet") and not p.rsplit("/", 1)[-1].startswith(".")
    }
    leaked = on_disk - referenced
    return leaked, live


def test_failed_group_rewrite_drops_staged_outputs_atomic_mode(spark, lake):
    """Non-partial mode: one group's rewrite raises a plain Spark error
    -> the OTHER groups' already-staged outputs are deleted, nothing
    commits, and the error propagates."""
    t = _four_file_table(spark, lake, "lab.fail_atomic")
    max_group = _two_file_groups(t)
    state_before = dict(t.log.state_at())
    victim = sorted(state_before)[-1]  # a file of the last-sorted group

    orig = t._read_paths

    def failing(paths, **kw):
        if any(victim in p for p in paths):
            raise RuntimeError("injected group rewrite failure")
        return orig(paths, **kw)

    t._read_paths = failing
    try:
        with pytest.raises(RuntimeError, match="injected"):
            rewrite_data_files(
                t,
                target_file_size_bytes=134217728,
                max_file_group_size_bytes=max_group,
            )
    finally:
        t._read_paths = orig

    # no commit happened; live state is untouched
    assert t.log.state_at() == state_before
    # and the successful group's staged output was swept immediately
    leaked, _ = _on_disk_equals_live(t)
    assert leaked == set(), f"staged outputs leaked: {leaked}"


def test_failed_group_rewrite_partial_progress_keeps_other_commits(spark, lake):
    """Partial-progress mode: a group whose REWRITE errors counts as
    failed and re-raises, but groups that finished still commit (that
    is the point of partial progress) and nothing leaks on disk."""
    t = _four_file_table(spark, lake, "lab.fail_partial")
    max_group = _two_file_groups(t)
    state_before = dict(t.log.state_at())
    victim = sorted(state_before)[-1]

    orig = t._read_paths

    def failing(paths, **kw):
        if any(victim in p for p in paths):
            raise RuntimeError("injected group rewrite failure")
        return orig(paths, **kw)

    t._read_paths = failing
    try:
        with pytest.raises(RuntimeError, match="injected"):
            rewrite_data_files(
                t,
                target_file_size_bytes=134217728,
                max_file_group_size_bytes=max_group,
                partial_progress_enabled=True,
            )
    finally:
        t._read_paths = orig

    # the healthy group's replace commit stands
    ops = [e.operation for e in t.log.entries()]
    assert ops.count("replace") >= 1
    # the failed group's inputs are still live (never replaced)
    assert victim in t.log.state_at()
    # all rows still readable, nothing lost or duplicated
    assert t.read().count() == 400
    leaked, _ = _on_disk_equals_live(t)
    assert leaked == set(), f"staged outputs leaked: {leaked}"


def test_oversized_lone_file_compacts_despite_min_input_files():
    """A single file above max_file_size_bytes is always a rewrite
    group, even when min-input-files is larger than the group."""
    big = FileInfo(path="a.parquet", size_bytes=10_000, row_count=1)
    small = FileInfo(path="b.parquet", size_bytes=10, row_count=1)
    groups = _plan_file_groups([("a.parquet", big)], 10**9, 5, 1_000)
    assert len(groups) == 1 and groups[0][0][0] == "a.parquet"
    # a lone WELL-SIZED file still never rewrites (idempotence)
    assert _plan_file_groups([("b.parquet", small)], 10**9, 1, 1_000) == []
    # min-input-files still gates multi-file groups with no oversize
    assert _plan_file_groups(
        [("a.parquet", small), ("b.parquet", small)], 10**9, 5, 1_000
    ) == []


def test_wap_id_reuse_rejected_at_stage_time(spark, lake):
    lake.create_namespace("lab", if_not_exists=True)
    t = lake.create_table("lab.wap_dup", schema="k bigint")
    t.append(spark.createDataFrame([(1,)], "k bigint"))
    t.stage_append(spark.createDataFrame([(2,)], "k bigint"), wap_id="job-1")
    with pytest.raises(ValueError, match="already staged"):
        t.stage_append(spark.createDataFrame([(3,)], "k bigint"), wap_id="job-1")
    # and after publishing, the id stays burned (publish refuses
    # double-publish, so re-staging it could never be published)
    from local_datalakehouse_phase2_spark.lakehouse import publish_changes

    publish_changes(t, "job-1")
    with pytest.raises(ValueError, match="already staged"):
        t.stage_append(spark.createDataFrame([(4,)], "k bigint"), wap_id="job-1")


def test_legacy_bare_name_watermark_still_gates_replay(spark, lake):
    """A table whose stream commits predate run-scoped watermark keys
    (`name` not `name:<queryId>`) must still treat a redelivered batch
    as seen after the upgrade."""
    from local_datalakehouse_phase2_spark.streaming.ingest import (
        STREAM_BATCH_KEY,
        STREAM_QUERY_KEY,
        append_stream_batch,
        last_committed_batch,
    )

    lake.create_namespace("lab", if_not_exists=True)
    t = lake.create_table("lab.legacy_wm", schema="k bigint")
    # pre-upgrade commit: bare query name as the watermark key
    t.append(
        spark.createDataFrame([(1,)], "k bigint"),
        extra={STREAM_BATCH_KEY: 7, STREAM_QUERY_KEY: "ingest"},
    )
    scoped = "ingest:11111111-2222-3333-4444-555555555555"
    assert last_committed_batch(t, scoped) == 7
    # replayed epoch 7 under the NEW scoped id is a no-op
    assert not append_stream_batch(
        t, spark.createDataFrame([(2,)], "k bigint"), batch_id=7, query_id=scoped
    )
    # the next epoch commits normally and advances the scoped watermark
    assert append_stream_batch(
        t, spark.createDataFrame([(3,)], "k bigint"), batch_id=8, query_id=scoped
    )
    assert last_committed_batch(t, scoped) == 8
    assert t.read().count() == 2


def test_strip_scheme_spares_windows_drives():
    strip = FileIO._strip_scheme
    assert strip("C:/data/x.parquet") == "C:/data/x.parquet"
    assert strip("s3a://bucket/k/x.parquet") == "/k/x.parquet"
    assert strip("file:/tmp/x") == "/tmp/x"
    assert strip("hdfs://nn:8020/warehouse/t") == "/warehouse/t"
    assert strip("/plain/posix/path") == "/plain/posix/path"
