"""Merge-on-read row-level deletes (Iceberg v2 content classes,
/root/reference/SPARK_ICEBERG_GUIDE.md:107 format-version 2,
:336-340 content=1/2 accounting, :17 rewrite_position_deletes scope).

Covers: position-delete write/read/time-travel, stacking, equality
deletes with the sequence rule, COW operators over live tombstones,
compaction folding deletes to zero, the real
rewrite_position_deletes / rewrite_equality_deletes procedures, and
the conflict paths (tombstone vs rewrite races in both directions).
"""

from __future__ import annotations

import time as _time

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import (
    CommitConflictError,
    Lakehouse,
    rewrite_data_files,
    rewrite_equality_deletes,
    rewrite_position_deletes,
)
from local_datalakehouse_phase2_spark.lakehouse.log import LogEntry


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v_"), F.col("id").cast("string")).alias("v"),
    )


def _content_counts(t) -> dict[int, int]:
    return {
        r["content"]: r["count"]
        for r in t.files().groupBy("content").count().collect()
    }


def _rows(t):
    return {tuple(r) for r in t.read().collect()}


# ---- position deletes --------------------------------------------------


def test_mor_delete_basic_and_time_travel(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.m1", schema="k bigint, v string")
    t.append(_mk(spark, 0, 100).repartition(4, "k"))
    pre_version = t.log.latest_version()
    entry = t.delete_where("k % 10 = 0", mode="merge-on-read")
    assert entry.operation == "delete"
    assert (entry.extra or {}).get("delete-mode") == "merge-on-read"
    # every added file is a content=1 tombstone file; no data rewritten
    assert all(fi.content == 1 for fi in entry.added_files)
    assert entry.removed_files == ()
    assert t.read().count() == 90
    assert t.read().filter(F.col("k") % 10 == 0).count() == 0
    cc = _content_counts(t)
    assert cc.get(1, 0) >= 1 and cc[0] == 4
    # time travel BEFORE the delete sees all rows
    assert t.read(version=pre_version).count() == 100
    # snapshots view counts DATA records only (tombstones aren't rows)
    snap = t.snapshots().orderBy(F.desc("snapshot_id")).first()
    assert snap["total_records"] == 100  # data files unchanged


def test_mor_delete_mode_from_table_property(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.m2",
        schema="k bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(_mk(spark, 0, 50))
    files_before = {p for p in t.log.state_at()}
    t.delete_where("k < 5")  # no explicit mode: property decides
    assert t.read().count() == 45
    # all pre-delete files still live (nothing rewritten)
    assert files_before <= set(t.log.state_at())


def test_mor_delete_stacks_and_empty_match_no_commit(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.m3", schema="k bigint, v string")
    t.append(_mk(spark, 0, 60))
    t.delete_where("k < 10", mode="merge-on-read")
    v = t.log.latest_version()
    t.delete_where("k >= 50", mode="merge-on-read")
    assert t.read().count() == 40
    # deleting already-deleted rows: no-op, no commit
    e = t.delete_where("k < 10", mode="merge-on-read")
    assert e.version == t.log.latest_version()
    assert t.read().count() == 40
    assert t.read(version=v).count() == 50


def test_cow_operators_respect_tombstones(spark, lake):
    """UPDATE / MERGE / COW DELETE planned over a table with live
    tombstones must neither resurrect deleted rows nor match them."""
    lake.create_namespace("lab")
    t = lake.create_table("lab.m4", schema="k bigint, v string")
    t.append(_mk(spark, 0, 40).repartition(2, "k"))
    t.delete_where("k % 4 = 0", mode="merge-on-read")
    assert t.read().count() == 30
    # UPDATE rewrites affected files: folded rows must stay deleted
    t.update_where({"v": "'upd'"}, "k = 1")
    assert t.read().count() == 30
    assert t.read().filter("v = 'upd'").count() == 1
    assert t.read().filter("k % 4 = 0 and k < 40").count() == 0
    # MERGE re-inserting a tombstoned key: insert path (key not live)
    src = spark.createDataFrame([(8, "back")], "k bigint, v string")
    t.merge(src, ["k"])
    rows = _rows(t)
    assert (8, "back") in rows
    assert t.read().count() == 31
    # COW delete over files that carry tombstones
    t.delete_where("k between 2 and 3", mode="copy-on-write")
    assert t.read().count() == 29


def test_equality_delete_sequence_rule(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.m5", schema="k bigint, v string")
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"))
    e = t.equality_delete(spark.createDataFrame([(2,), (9,)], "k bigint"), ["k"])
    assert all(fi.content == 2 and fi.eq_cols == ["k"] for fi in e.added_files)
    assert sorted(r.k for r in t.read().collect()) == [1, 3]
    # the SAME key appended after the delete is NOT deleted (seq rule)
    t.append(spark.createDataFrame([(2, "b2")], "k bigint, v string"))
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (1, "a"),
        (2, "b2"),
        (3, "c"),
    ]


def test_equality_delete_null_matches_null(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.m6", schema="k bigint, v string")
    t.append(
        spark.createDataFrame([(1, "a"), (None, "n1"), (None, "n2")], "k bigint, v string")
    )
    t.equality_delete(
        spark.createDataFrame([(None,)], "k bigint"), ["k"]
    )
    assert sorted(r.v for r in t.read().collect()) == ["a"]


# ---- fold-back procedures ----------------------------------------------


def test_compaction_folds_position_deletes_to_zero(spark, lake):
    """The VERDICT r5 'done' bar: `.files` shows content=1 files before
    compaction and zero after, with the row set preserved."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.f1",
        schema="k bigint, v string",
        properties={"write.target-file-size-bytes": "65536"},
    )
    t.append(_mk(spark, 0, 50).repartition(4, "k"))
    t.append(_mk(spark, 50, 100).repartition(4, "k"))
    t.delete_where("k % 10 = 0", mode="merge-on-read")
    expected = _rows(t)
    assert _content_counts(t).get(1, 0) >= 1
    res = rewrite_data_files(t, target_file_size_bytes=134217728)
    assert res["rewritten_files"] == 8
    assert res["folded_delete_files"] >= 1
    cc = _content_counts(t)
    assert 1 not in cc, f"pos delete files must be zero after compaction: {cc}"
    assert _rows(t) == expected


def test_rewrite_position_deletes_drops_dangling_and_compacts(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.f2", schema="k bigint, v string")
    t.append(_mk(spark, 0, 40).repartition(4, "k"))
    t.delete_where("k < 5", mode="merge-on-read")
    t.delete_where("k >= 35", mode="merge-on-read")
    n_delete_files = _content_counts(t)[1]
    assert n_delete_files >= 2
    expected = _rows(t)
    # COW-delete one key: only ITS file rewrites, so that file's
    # tombstones dangle while the other files' stay live
    t.delete_where("k = 20", mode="copy-on-write")
    assert len(t.log.read_entry(t.log.latest_version()).removed_files) == 1
    expected = {r for r in expected if r[0] != 20}
    res = rewrite_position_deletes(t)
    assert res["rewritten_delete_files"] == n_delete_files
    assert res["remaining_delete_files"] == 1
    assert _rows(t) == expected
    # idempotent: second run skips (single compacted file, no dangling)
    res2 = rewrite_position_deletes(t)
    assert res2.get("skipped") or res2["rewritten_delete_files"] == 0


def test_rewrite_equality_deletes_scoped_fold(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.f3", schema="k bigint, v string")
    t.append(spark.createDataFrame([(i, "old") for i in range(10)], "k bigint, v string"))
    t.equality_delete(spark.createDataFrame([(3,), (4,)], "k bigint"), ["k"])
    # appended after the delete: must survive the fold untouched
    post = t.log.latest_version()
    t.append(spark.createDataFrame([(3, "new")], "k bigint, v string"))
    new_file_paths = {
        fi.path for fi in t.log.read_entry(t.log.latest_version()).added_files
    }
    expected = _rows(t)
    res = rewrite_equality_deletes(t)
    assert res["rewritten_delete_files"] == 1 or res["rewritten_delete_files"] >= 1
    assert _rows(t) == expected
    assert 2 not in _content_counts(t)
    # the post-delete file was NOT rewritten (sequence rule scoping)
    assert new_file_paths <= set(t.log.state_at())


def test_rewrite_equality_deletes_metadata_only_when_stale(spark, lake):
    """All data predating the eq delete compacted away -> the delete
    file drops with NO data rewrite."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.f4",
        schema="k bigint, v string",
        properties={"write.target-file-size-bytes": "65536"},
    )
    t.append(_mk(spark, 0, 50).repartition(4, "k"))
    t.equality_delete(spark.createDataFrame([(7,)], "k bigint"), ["k"])
    res = rewrite_data_files(t, target_file_size_bytes=134217728)
    # compaction folded the eq delete and dropped the stale file
    assert res["folded_delete_files"] >= 1
    assert 2 not in _content_counts(t)
    assert t.read().count() == 49
    res2 = rewrite_equality_deletes(t)
    assert res2["rewritten_data_files"] == 0


# ---- conflict paths ----------------------------------------------------


def _inject_before_append(t, inject):
    """Wrap t.log.append so `inject` runs (once) right before the real
    commit loop — a deterministic stand-in for a racing writer."""
    orig = t.log.append
    state = {"done": False}

    def wrapped(make, **kwargs):
        if not state["done"]:
            state["done"] = True
            inject()
        return orig(make, **kwargs)

    t.log.append = wrapped
    return orig


def test_mor_delete_conflicts_with_racing_replace(spark, lake):
    """A position delete whose referenced data file was replaced
    mid-flight must raise, not commit dangling tombstones that silently
    delete nothing."""
    lake.create_namespace("lab")
    t = lake.create_table("lab.c1", schema="k bigint, v string")
    t.append(_mk(spark, 0, 40).repartition(2, "k"))

    def compact():
        t.log.append = orig  # inject once, then restore
        rewrite_data_files(t, target_file_size_bytes=134217728, min_input_files=1)

    orig = _inject_before_append(t, compact)
    try:
        with pytest.raises(CommitConflictError, match="referenced data file"):
            t.delete_where("k < 10", mode="merge-on-read")
    finally:
        t.log.append = orig
    # the failed delete left no tombstones behind
    assert 1 not in _content_counts(t)
    assert t.read().count() == 40


def test_cow_rewrite_conflicts_with_racing_mor_delete(spark, lake):
    """The reverse race: a COW UPDATE planned before a tombstone landed
    must conflict (its rewritten rows would resurrect the deleted ones)."""
    lake.create_namespace("lab")
    t = lake.create_table("lab.c2", schema="k bigint, v string")
    t.append(_mk(spark, 0, 40).repartition(2, "k"))

    def mor_delete():
        t.log.append = orig
        t.delete_where("k = 2", mode="merge-on-read")

    orig = _inject_before_append(t, mor_delete)
    try:
        with pytest.raises(CommitConflictError, match="delete-file set"):
            t.update_where({"v": "'x'"}, "k < 10")
    finally:
        t.log.append = orig
    # the tombstone won; the update never landed
    assert t.read().count() == 39
    assert t.read().filter("v = 'x'").count() == 0


def test_compaction_conflicts_with_racing_mor_delete(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.c3", schema="k bigint, v string")
    t.append(_mk(spark, 0, 50).repartition(2, "k"))
    t.append(_mk(spark, 50, 100).repartition(2, "k"))

    orig_write = t._write_files
    fired = {"done": False}

    def racing(df, **kw):
        files = orig_write(df, **kw)
        if not fired["done"]:
            fired["done"] = True
            t._write_files = orig_write
            t.delete_where("k = 1", mode="merge-on-read")
            t._write_files = racing
        return files

    t._write_files = racing
    try:
        with pytest.raises(CommitConflictError, match="delete files"):
            rewrite_data_files(t, target_file_size_bytes=134217728)
    finally:
        t._write_files = orig_write
    # the delete stands; compaction aborted cleanly
    assert t.read().count() == 99


def test_sort_strategy_partial_progress_keeps_earlier_groups(spark, lake):
    """VERDICT r5 task 2 'done' bar: a mid-sequence conflict under
    strategy='sort' keeps earlier group commits (clustered compaction
    now plans bounded file groups instead of one whole-table commit)."""
    lake.create_namespace("lab")
    t = lake.create_table("lab.c4", schema="k bigint, v string")
    for i in range(4):
        t.append(_mk(spark, i * 100, (i + 1) * 100).repartition(1))
    state = t.log.state_at()
    sizes = sorted((fi.size_bytes for fi in state.values()), reverse=True)
    max_group = sizes[0] + sizes[1] + 1  # two files per group
    # clustered groups are ordered by min(k), not by path: the victim
    # must be a member of the SECOND group (k >= 200)
    by_key = sorted(state.items(), key=lambda it: int(it[1].stats["k"][0]))
    victim = by_key[2][0]

    orig = t._write_files
    calls = {"n": 0}

    def racing(df, **kw):
        files = orig(df, **kw)
        calls["n"] += 1
        if calls["n"] == 2:  # while the SECOND group stages

            def mk(v):
                return LogEntry(
                    version=v,
                    snapshot_id=v,
                    committed_at=_time.time(),
                    operation="delete",
                    removed_files=(victim,),
                )

            t.log.append(mk)
        return files

    t._write_files = racing
    try:
        res = rewrite_data_files(
            t,
            target_file_size_bytes=134217728,
            strategy="sort",
            sort_order="k",
            max_file_group_size_bytes=max_group,
            partial_progress_enabled=True,
        )
    finally:
        t._write_files = orig

    assert res["file_groups"] == 2
    assert res["failed_groups"] == 1
    # one group committed: exactly one replace in the log
    ops = [e.operation for e in t.log.entries()]
    assert ops.count("replace") == 1


def test_sort_groups_ordered_by_leading_column(spark, lake):
    """Banded clustering: groups follow the leading sort column's
    logged min, so each group covers an adjacent key range and output
    files stay sorted for pruning."""
    lake.create_namespace("lab")
    t = lake.create_table("lab.c5", schema="k bigint, v string")
    # append out of key order so path order != key order
    for lo in (300, 100, 0, 200):
        t.append(_mk(spark, lo, lo + 100).repartition(1))
    state = t.log.state_at()
    sizes = sorted((fi.size_bytes for fi in state.values()), reverse=True)
    max_group = sizes[0] + sizes[1] + 1
    res = rewrite_data_files(
        t,
        target_file_size_bytes=134217728,
        strategy="sort",
        sort_order="k",
        max_file_group_size_bytes=max_group,
    )
    assert res["file_groups"] == 2
    # every output file's [min,max] k-range: ranges from different
    # groups must not interleave (group 1 = keys 0..199, group 2 =
    # 200..399 because candidates were ordered by min(k), not by path)
    ranges = sorted(
        (int(fi.stats["k"][0]), int(fi.stats["k"][1]))
        for fi in t.log.state_at().values()
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2 or lo1 == lo2  # no interleaving across files
    assert t.read().count() == 400


def test_cow_delete_keeps_null_condition_rows(spark, lake):
    """SQL DELETE removes rows where the predicate IS TRUE; a NULL
    predicate row sharing a file with a matched row must survive the
    copy-on-write rewrite (review batch 6, finding 1 — merge-on-read
    already got this right)."""
    lake.create_namespace("lab")
    for mode in ("copy-on-write", "merge-on-read"):
        name = f"lab.null_{mode[:3]}"
        t = lake.create_table(name, schema="k bigint, v string")
        t.append(
            spark.createDataFrame(
                [(1, "x"), (2, None), (3, "y")], "k bigint, v string"
            ).coalesce(1)
        )
        t.delete_where("v = 'x'", mode=mode)
        assert sorted((r.k, r.v) for r in t.read().collect()) == [
            (2, None),
            (3, "y"),
        ], mode


def test_wap_audit_matches_publish_under_eq_delete(spark, lake):
    """An equality delete committed AFTER staging must not apply to the
    staged rows in the AUDIT read — publish re-stamps their sequence
    number past it, so the audit must show what publish will produce
    (review batch 6, finding 2)."""
    from local_datalakehouse_phase2_spark.lakehouse import publish_changes

    lake.create_namespace("lab")
    t = lake.create_table("lab.wapeq", schema="k bigint, v string")
    t.append(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    stage = t.stage_append(
        spark.createDataFrame([(2, "staged")], "k bigint, v string"), wap_id="w1"
    )
    t.equality_delete(spark.createDataFrame([(2,)], "k bigint"), ["k"])
    audit = sorted((r.k, r.v) for r in t.read(version=stage.version).collect())
    assert audit == [(1, "a"), (2, "staged")]  # delete predates publish
    publish_changes(t, "w1")
    assert sorted((r.k, r.v) for r in t.read().collect()) == audit


# ---- merge-on-read UPDATE / MERGE --------------------------------------


def test_mor_update_tombstone_plus_data_pair(spark, lake):
    """write.update.mode=merge-on-read: one commit holding a content=1
    tombstone file plus the updated rows' data file — Iceberg v2's
    delete-file + data-file UPDATE shape (guide :336-340) — with no
    data file removed."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.u1",
        schema="k bigint, v string",
        properties={"write.update.mode": "merge-on-read"},
    )
    t.append(_mk(spark, 0, 100).repartition(4, "k"))
    files0 = set(t.log.state_at())
    e = t.update_where({"v": "concat('upd_', cast(k as string))"}, "k < 10")
    assert e.operation == "update" and e.removed_files == ()
    assert {fi.content for fi in e.added_files} == {0, 1}
    assert files0 <= set(t.log.state_at())
    r = t.read()
    assert r.count() == 100
    assert r.filter("v like 'upd_%'").count() == 10
    assert r.filter("k >= 10 and v like 'upd_%'").count() == 0
    # expressions see the PRE-update row (SET a=b, b=a swaps)
    t2 = lake.create_table(
        "lab.u2",
        schema="a bigint, b bigint",
        properties={"write.update.mode": "merge-on-read"},
    )
    t2.append(spark.createDataFrame([(1, 10), (2, 20)], "a bigint, b bigint"))
    t2.update_where({"a": "b", "b": "a"}, "a = 1")
    assert sorted((x.a, x.b) for x in t2.read().collect()) == [(2, 20), (10, 1)]
    # nothing matched: no commit
    v = t2.log.latest_version()
    t2.update_where({"a": "0"}, "a = 999")
    assert t2.log.latest_version() == v


def test_mor_merge_upsert_and_fold(spark, lake):
    """write.merge.mode=merge-on-read: matched keys tombstoned, source
    appended, O(source) written; stacked tombstones (update then merge
    on the same key) fold correctly under compaction."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.g1",
        schema="k bigint, v string",
        properties={
            "write.update.mode": "merge-on-read",
            "write.merge.mode": "merge-on-read",
        },
    )
    t.append(_mk(spark, 0, 100).repartition(4, "k"))
    t.update_where({"v": "'upd'"}, "k < 10")
    src = spark.createDataFrame([(5, "merged"), (200, "new")], "k bigint, v string")
    e = t.merge(src, ["k"])
    assert e.operation == "merge" and e.removed_files == ()
    assert {fi.content for fi in e.added_files} == {0, 1}
    r = t.read()
    assert r.count() == 101
    assert r.filter("k = 5").first().v == "merged"  # newest version wins
    assert r.filter("k = 200").count() == 1
    assert r.filter("v = 'upd'").count() == 9  # k=5's upd row replaced
    res = rewrite_data_files(t, target_file_size_bytes=134217728, min_input_files=1)
    assert res["folded_delete_files"] >= 1
    assert set(_content_counts(t)) == {0}
    r2 = t.read()
    assert r2.count() == 101 and r2.filter("k = 5").first().v == "merged"
    # MERGE source missing a table column raises (same strictness as COW)
    with pytest.raises(Exception, match="missing table columns"):
        t.merge(spark.createDataFrame([(1,)], "k bigint"), ["k"])


def test_delete_file_threshold_forces_lone_file_rewrite(spark, lake):
    """Iceberg's delete-file-threshold rule: a data file referenced by
    live delete files is a rewrite candidate even when it is alone in
    its partition and inside the well-sized band — otherwise its
    tombstones never fold and every read pays the anti-join forever."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.thr",
        schema="id bigint, cat string",
        properties={
            "partition.spec": "cat",
            "write.delete.mode": "merge-on-read",
        },
    )
    # one file per partition: every partition group has exactly 1 file
    t.append(
        spark.range(0, 90)
        .select(
            "id",
            F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("cat"),
        )
        .repartition(1)
    )
    t.delete_where("id % 7 = 0")  # ids 0,7,14,... hit all three cats
    assert any(fi.content == 1 for fi in t.log.state_at().values())
    expect = 90 - 13
    assert t.read().count() == expect
    res = rewrite_data_files(t, target_file_size_bytes=134217728, min_input_files=1)
    # all three lone-per-partition files rewrote because deletes touch them
    assert res["rewritten_files"] == 3 and res["failed_groups"] == 0
    st = t.log.state_at().values()
    assert {fi.content for fi in st} == {0}
    assert t.read().count() == expect
    # threshold disabled -> nothing rewrites (no size-band candidates)
    t.delete_where("id = 1")
    res2 = rewrite_data_files(
        t,
        target_file_size_bytes=134217728,
        min_input_files=1,
        delete_file_threshold=10**9,
    )
    assert res2["skipped"] is True
    assert any(fi.content == 1 for fi in t.log.state_at().values())


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
