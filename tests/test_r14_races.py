"""Round-14 race closure (VERDICT r13 item 3): the catalog-merge
validate->marker-flip window.

The documented stance (3da38f1) was: a per-table main writer landing
between merge_catalog_branch's final revalidation and its txn-marker
flip could invalidate a staged entry after its last check — e.g. a
copy-on-write DELETE rewriting a file the staged merge entry also
removes, duplicating that file's rows once the marker flips. The r14
closure is two-sided and rides the existing atomic primitives:

- a writer that lands BEFORE the merge stages its entry is seen by the
  merge's marker-time revalidation (the merge aborts — existing tests);
- a writer that claims a version slot AFTER the staged entry re-runs
  its make() against a log that already contains the pending entry;
  on file overlap it decides the txn ABORTED through the same O_EXCL
  marker create the merge's flip uses (first committer wins —
  log.decide_txn via table._check_pending_txn_claims). Exactly one of
  {writer commit, marker flip} survives; both-surviving (the silent
  duplication) is impossible by the marker's O_EXCL.

These tests hold the merge OPEN inside the window (a barrier in
`_decide`) and drive the racing writer through it.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    CommitConflictError,
    Lakehouse,
)
from local_datalakehouse_phase2_spark.lakehouse import catalog_refs as cr
from local_datalakehouse_phase2_spark.lakehouse.log import LogEntry
from local_datalakehouse_phase2_spark.lakehouse.maintenance import (
    rewrite_data_files,
)


def _df(spark, *rows):
    return spark.createDataFrame(list(rows), "k bigint, v string")


def _rows(lake, ident):
    return {tuple(r) for r in lake.read(ident).collect()}


def _lake(spark, tmp_path, name="w"):
    lake = Lakehouse(spark, str(tmp_path / name))
    lake.create_namespace("lab")
    t = lake.create_table("lab.t1", schema="k bigint, v string")
    t.append(_df(spark, (1, "m1"), (2, "m2")).coalesce(1))
    return lake


def _merge_in_window(monkeypatch, lake, name):
    """Start merge_catalog_branch(name) in a thread and return
    (entered, release, thread, result): `entered` fires once the merge
    has passed its final revalidation and sits INSIDE the
    validate->flip window; `release` lets it attempt the marker."""
    entered = threading.Event()
    release = threading.Event()
    orig = cr.CatalogRefs._decide

    def held(self, txn_id, status, reanchor):
        if status == "committed":
            entered.set()
            assert release.wait(timeout=60), "test deadlock"
        return orig(self, txn_id, status, reanchor)

    monkeypatch.setattr(cr.CatalogRefs, "_decide", held)
    result: dict = {}

    def run():
        try:
            result["res"] = lake.merge_catalog_branch(name)
        except BaseException as e:  # surface in the main thread
            result["err"] = e

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return entered, release, th, result


def test_cow_writer_inside_merge_window_wins(spark, tmp_path, monkeypatch):
    """A copy-on-write DELETE racing inside the window keeps the
    pre-r14 first-committer-wins outcome — but race-free: the writer
    aborts the undecided txn at the marker, the merge's own flip then
    loses, and NO duplicate rows exist afterwards (the lost-update the
    open window allowed)."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    # branch overwrite: the staged merge entry REMOVES main's file
    lake.overwrite("lab.t1", _df(spark, (10, "e10")), catalog_ref="etl")

    entered, release, th, result = _merge_in_window(monkeypatch, lake, "etl")
    assert entered.wait(timeout=60), "merge never reached the window"
    try:
        # rewrites the exact file the staged merge entry removes
        lake.table("lab.t1").delete_where("k = 1")
    finally:
        release.set()
        th.join(timeout=60)
    # the merge LOST at the marker — with a conflict, not a crash
    assert "res" not in result
    assert isinstance(result["err"], CommitConflictError)
    assert "aborted txn" in str(result["err"])
    # writer-wins state, no duplication, branch data never published
    assert _rows(lake, "lab.t1") == {(2, "m2")}
    # the branch survives; its overwrite now CONTENT-conflicts with the
    # writer's rewrite (correct — both touched the same file), so the
    # Nessie-style resolution applies: drop the conflicted commit,
    # re-apply the change on the rebased branch, merge cleanly
    with pytest.raises(CommitConflictError, match="conflicts with main"):
        lake.rebase_catalog_branch("etl")
    lake.rebase_catalog_branch("etl", drop_conflicting=True)
    lake.overwrite("lab.t1", _df(spark, (10, "e10")), catalog_ref="etl")
    res = lake.merge_catalog_branch("etl")
    assert res["status"] == "committed"
    assert _rows(lake, "lab.t1") == {(10, "e10")}


def test_mor_writer_inside_merge_window_wins(spark, tmp_path, monkeypatch):
    """A merge-on-read DELETE tombstoning rows of a file the staged
    entry removes is the same lost update (the tombstone would target
    a dead file once the marker flips) — same arbitration."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.overwrite("lab.t1", _df(spark, (10, "e10")), catalog_ref="etl")

    entered, release, th, result = _merge_in_window(monkeypatch, lake, "etl")
    assert entered.wait(timeout=60)
    try:
        lake.table("lab.t1").delete_where("k = 1", mode="merge-on-read")
    finally:
        release.set()
        th.join(timeout=60)
    assert isinstance(result.get("err"), CommitConflictError)
    assert _rows(lake, "lab.t1") == {(2, "m2")}


def test_disjoint_writer_inside_merge_window_commutes(spark, tmp_path, monkeypatch):
    """A plain append (no file overlap with the staged entry) commutes
    with the merge: neither side aborts — the claim check is
    file-scoped, not a table lock."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    # append-only branch chain: the staged entry removes nothing
    lake.append("lab.t1", _df(spark, (10, "e10")), catalog_ref="etl")

    entered, release, th, result = _merge_in_window(monkeypatch, lake, "etl")
    assert entered.wait(timeout=60)
    try:
        lake.table("lab.t1").append(_df(spark, (3, "m3")).coalesce(1))
    finally:
        release.set()
        th.join(timeout=60)
    assert "err" not in result, result.get("err")
    assert result["res"]["status"] == "committed"
    assert _rows(lake, "lab.t1") == {(1, "m1"), (2, "m2"), (3, "m3"), (10, "e10")}


def _stage_fake_pending_txn(lake, ident, txn_id):
    """Append a staged txn entry (pending: no marker file) removing one
    of the table's live files — the multi-table-transaction shape,
    minus the orchestrator."""
    t = lake.table(ident)
    path = sorted(p for p, fi in t.log.state_at().items() if fi.content == 0)[0]

    def make(version: int) -> LogEntry:
        import time as _t

        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=_t.time(),
            operation="delete",
            removed_files=(path,),
            extra={"txn": txn_id},
        )

    t.log.append(make)
    return t, path


def _marker(lake, txn_id):
    p = os.path.join(lake.warehouse_dir, ".txns", f"{txn_id}.json")
    with open(p) as f:
        return json.load(f)


def test_compaction_aborts_pending_txn_it_overlaps(spark, tmp_path):
    """rewrite_data_files replacing a file a pending txn removes
    decides that txn aborted and proceeds — and the abort is recorded
    at the marker so the txn's own commit() later loses cleanly."""
    lake = _lake(spark, tmp_path)
    lake.table("lab.t1").append(_df(spark, (3, "m3")).coalesce(1))
    t, path = _stage_fake_pending_txn(lake, "lab.t1", "fake-txn-1")
    res = rewrite_data_files(t)
    assert res["rewritten_files"] >= 2 and not res["failed_groups"]
    assert _rows(lake, "lab.t1") == {(1, "m1"), (2, "m2"), (3, "m3")}
    m = _marker(lake, "fake-txn-1")
    assert m["status"] == "aborted" and m["decided_by"] == "conflicting-writer"
    # the aborted entry never folds: state is the compacted file only
    assert all(fi.content != 0 or "v" in p for p, fi in t.log.state_at().items())


def test_writer_loses_when_txn_committed_first(spark, tmp_path):
    """The other marker outcome: the txn's marker says committed by the
    time the writer tries to decide — the writer must re-plan, never
    override a decided txn."""
    lake = _lake(spark, tmp_path)
    t, path = _stage_fake_pending_txn(lake, "lab.t1", "fake-txn-2")
    # txn decides first (its staged entry removes the file for real)
    assert t.log.decide_txn("fake-txn-2", "committed") == "committed"
    # a decided txn is immutable: a later abort attempt reads, not writes
    assert t.log.decide_txn("fake-txn-2", "aborted") == "committed"
    # the writer re-plans against the post-txn state: the file is gone,
    # nothing matches, no commit
    t.update_where({"v": "'u'"}, "k = 1")
    assert _rows(lake, "lab.t1") == set()


def test_update_aborts_pending_txn_it_overlaps(spark, tmp_path):
    """COW UPDATE through the same guard: the pending txn dies at the
    marker, the update commits, rows reflect the update alone."""
    lake = _lake(spark, tmp_path)
    t, path = _stage_fake_pending_txn(lake, "lab.t1", "fake-txn-3")
    t.update_where({"v": "'u'"}, "k = 1")
    assert _marker(lake, "fake-txn-3")["status"] == "aborted"
    assert _rows(lake, "lab.t1") == {(1, "u"), (2, "m2")}


# ---- r13-seam hunt (VERDICT item 7): fastwrite mtimes & the ledger --


def test_orphan_sweep_refuses_on_observed_clock_skew(spark, tmp_path):
    """A commit stamped in the sweeper's future proves writer/sweeper
    clocks disagree; the sweep must refuse (mtimes untrustworthy)
    rather than risk deleting another host's in-flight staged files —
    the fastwrite path never passes a committer rename, so its staged
    bytes have exactly one mtime protecting them."""
    from local_datalakehouse_phase2_spark.lakehouse import maintenance as mnt
    from local_datalakehouse_phase2_spark.lakehouse.maintenance import (
        MaintenanceError,
        remove_orphan_files,
    )

    lake = _lake(spark, tmp_path)
    t = lake.table("lab.t1")
    remove_orphan_files(t)  # sane clocks: runs fine
    # skewed writer: re-stamp the newest entry 1h into the future
    v = t.log.latest_version()
    p = os.path.join(t.log.metadata_dir, f"{v:010d}.json")
    raw = json.load(open(p))
    raw["committed_at"] = time.time() + 3600.0
    with open(p, "w") as f:
        json.dump(raw, f)
    # re-open: a real skewed commit arrives as a NEW entry from another
    # host; this in-place edit must bypass the (write-once-justified)
    # parsed-entry cache the same way — via a cold log instance, the
    # sweeper-as-separate-process view
    t = Lakehouse(spark, str(tmp_path / "w")).table("lab.t1")
    with pytest.raises(MaintenanceError, match="clocks disagree"):
        remove_orphan_files(t)


def test_ledger_deferred_read_fails_loud_on_cross_process_expire(spark, tmp_path):
    """_CountLedger's soundness rests on snapshot pinning; a SECOND
    process expiring snapshots can delete pinned bytes. The contract:
    the deferred resolve fails LOUDLY (Spark missing-file error) —
    never a silently wrong count — and the eager schedule the
    file-deleting entries use is correct under the same interleaving."""
    from local_datalakehouse_phase2_spark.lakehouse.maintenance import (
        expire_snapshots,
    )
    from local_datalakehouse_phase2_spark.operators.maintenance_queries import (
        _CountLedger,
    )

    wh = str(tmp_path / "w")
    lake_a = Lakehouse(spark, wh)
    lake_a.create_namespace("lab")
    t_a = lake_a.create_table("lab.t", schema="k bigint, v string")
    t_a.append(_df(spark, (1, "a"), (2, "b")).coalesce(1))

    led = _CountLedger()
    pinned = lake_a.table("lab.t").read()  # snapshot-pinned file set
    (slot,) = led.counts(pinned)
    eager = pinned.count()  # the documented-safe schedule
    assert eager == 2

    # "another process": an independent Lakehouse over the same path
    lake_b = Lakehouse(spark, wh)
    t_b = lake_b.table("lab.t")
    t_b.overwrite(_df(spark, (9, "z")).coalesce(1))
    expire_snapshots(t_b, retain_last=1)  # deletes the pinned file

    with pytest.raises(Exception) as ei:
        led.resolve([(slot,)])
    msg = str(ei.value)
    assert "exist" in msg or "FileNotFound" in msg or "FILE" in msg.upper()


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
