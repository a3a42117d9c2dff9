"""r16: the orphan sweep's protection set is O(suffix), not O(all
versions) (VERDICT item 4), and the clock-skew tripwire keeps evidence
frozen under a checkpoint (ADVICE).

Checkpoints now carry a cumulative `referenced` path set (everything
reachable at/below them, any lineage), so `remove_orphan_files` folds
only the above-checkpoint suffix. `expire_snapshots` subtracts the
paths it deletes; a crash between its entry-drop and delete steps
leaves a protected leak that `full_scan=True` reclaims.
"""

from __future__ import annotations

import os
import time

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    Lakehouse,
    expire_snapshots,
    remove_orphan_files,
)
from local_datalakehouse_phase2_spark.lakehouse.fs import LocalFileIO
from local_datalakehouse_phase2_spark.lakehouse.maintenance import MaintenanceError
from local_datalakehouse_phase2_spark.localrows import local_df

_ENTRY_SUFFIX = ".json"


class PathRecordingIO(LocalFileIO):
    """LocalFileIO recording every read_text path (for entry-read
    counting; the method-count shim in test_fileio can't tell an entry
    read from a checkpoint read)."""

    def __init__(self):
        self.reads: list[str] = []

    def read_text(self, path: str) -> str:
        self.reads.append(path)
        return super().read_text(path)

    def entry_reads(self) -> list[str]:
        import re

        pat = re.compile(r"/\d{10}\.json$")
        return [p for p in self.reads if pat.search(p)]


def _table_with_versions(spark, warehouse, n_versions, io=None):
    lake = Lakehouse(spark, warehouse, io=io or LocalFileIO())
    lake.create_namespace("lab", if_not_exists=True)
    t = lake.create_table(
        "lab.t", schema="k bigint, v string", properties={"gc.enabled": "true"}
    )
    for i in range(n_versions):
        t.append(local_df(spark, [(i, f"v{i}")], "k bigint, v string"))
    return lake, t


def test_orphan_sweep_entry_reads_are_o_suffix(spark, tmp_path):
    """After a checkpoint at version ~N, a cold sweeper reads only the
    suffix entries (plus the checkpoint), never all N versions."""
    warehouse = str(tmp_path / "w")
    _, t = _table_with_versions(spark, warehouse, 20)
    cpv = t.log.write_checkpoint()
    assert cpv >= 18  # create + 20 appends, nothing pending
    for i in (100, 101):
        t.append(local_df(spark, [(i, f"v{i}")], "k bigint, v string"))

    # cold handle: fresh io (path-recording) and fresh caches
    rio = PathRecordingIO()
    cold = Lakehouse(spark, warehouse, io=rio).table("lab.t")
    suffix = [v for v in cold.log.versions() if v > cpv]
    rio.reads.clear()
    remove_orphan_files(cold, older_than=time.time() - 86401)
    n_entry_reads = len(set(rio.entry_reads()))
    # suffix entries only (the skew probe and the fold share the cache)
    assert n_entry_reads <= len(suffix), (
        f"sweep read {n_entry_reads} distinct entry files for a "
        f"{len(suffix)}-entry suffix over {len(cold.log.versions())} versions"
    )


def test_fast_path_sweeps_strays_and_keeps_time_travel(spark, tmp_path):
    """The fast path must delete a genuinely orphaned file and keep
    every file any surviving version references (time travel intact)."""
    warehouse = str(tmp_path / "w")
    _, t = _table_with_versions(spark, warehouse, 5)
    t.log.write_checkpoint()
    t.append(local_df(spark, [(99, "v99")], "k bigint, v string"))

    stray = os.path.join(t.data_dir, "vdeadbeef", "stray.parquet")
    os.makedirs(os.path.dirname(stray), exist_ok=True)
    with open(stray, "w") as f:
        f.write("junk")
    old = time.time() - 200000
    os.utime(stray, (old, old))
    os.utime(os.path.dirname(stray), (old, old))

    before = {
        v: sorted(t.log.state_at(v).keys()) for v in t.log.versions()
    }
    res = remove_orphan_files(t, older_than=time.time() - 86401)
    assert res["deleted_files"] == 1
    assert not os.path.exists(stray)
    for v, files in before.items():
        assert sorted(t.log.state_at(v).keys()) == files
        for rel in files:
            assert os.path.exists(os.path.join(t.table_dir, rel))


def test_expiry_unprotects_what_it_deletes(spark, tmp_path):
    """expire_snapshots subtracts the deleted paths from the carried
    `referenced` set, so the next sweep's protection set doesn't grow
    without bound across compact/expire cycles."""
    warehouse = str(tmp_path / "w")
    _, t = _table_with_versions(spark, warehouse, 4)
    first_files = set(t.log.state_at().keys())
    # overwrite drops all previous files from live state
    t.overwrite(local_df(spark, [(1, "only")], "k bigint, v string"))
    res = expire_snapshots(t, retain_last=1)
    assert res["deleted_files"] == len(first_files)
    cp = t.log._read_checkpoint()
    assert cp is not None and "referenced" in cp
    assert not (set(cp["referenced"]) & first_files)
    # live file still protected
    assert set(t.log.state_at().keys()) <= set(cp["referenced"]) | {
        fi.path for v in t.log.versions() for fi in t.log.read_entry(v).added_files
    }


def test_crashed_expiry_leak_is_reclaimed_by_full_scan(spark, tmp_path):
    """Crash between expiry's entry-drop and its delete/unprotect: the
    leaked file stays PROTECTED on the fast path (never data loss the
    other way), and full_scan=True prunes the stale protection and
    reclaims it."""
    warehouse = str(tmp_path / "w")
    lake, t = _table_with_versions(spark, warehouse, 4)
    first_files = sorted(t.log.state_at().keys())
    t.overwrite(local_df(spark, [(1, "only")], "k bigint, v string"))

    class CrashAfterDrop(Exception):
        pass

    real_remove_entries = t.log.remove_entries

    def crashing_remove_entries(versions):
        real_remove_entries(versions)
        raise CrashAfterDrop()

    t.log.remove_entries = crashing_remove_entries
    with pytest.raises(CrashAfterDrop):
        expire_snapshots(t, retain_last=1)
    t.log.remove_entries = real_remove_entries

    # the doomed files survived the crash, still protected by the
    # checkpoint's carried referenced set
    leaked = [p for p in first_files if os.path.exists(os.path.join(t.table_dir, p))]
    assert leaked == first_files
    aged = time.time() - 200000
    for p in leaked:
        full = os.path.join(t.table_dir, p)
        os.utime(full, (aged, aged))
        os.utime(os.path.dirname(full), (aged, aged))
    res = remove_orphan_files(t, older_than=time.time() - 86401)
    assert res["deleted_files"] == 0  # fast path: protected, not swept

    res = remove_orphan_files(t, older_than=time.time() - 86401, full_scan=True)
    assert res["deleted_files"] == len(first_files)
    for p in first_files:
        assert not os.path.exists(os.path.join(t.table_dir, p))
    # the stale protection is pruned from the checkpoint too (self-heal)
    cp = t.log._read_checkpoint()
    assert not (set(cp["referenced"]) & set(first_files))


def test_future_stamp_frozen_under_checkpoint_still_refuses(spark, tmp_path):
    """ADVICE (r15): a future-stamped entry frozen under a checkpoint
    must keep refusing the destructive sweep — checkpoints record the
    max writer stamp they froze and the tripwire includes it."""
    from local_datalakehouse_phase2_spark.lakehouse.log import LogEntry

    warehouse = str(tmp_path / "w")
    _, t = _table_with_versions(spark, warehouse, 2)
    t.log.append(
        lambda v: LogEntry(
            version=v,
            snapshot_id=v,
            committed_at=time.time() + 7200.0,  # 2h ahead: skewed writer
            operation="append",
        )
    )
    t.log.write_checkpoint()  # the evidence is now below the checkpoint
    t.append(local_df(spark, [(7, "v7")], "k bigint, v string"))
    with pytest.raises(MaintenanceError, match="future"):
        remove_orphan_files(t, older_than=time.time() - 86401)


def test_subtract_racing_new_checkpoint_leaks_safe(spark, tmp_path):
    """Seam (r16 hunt): expire_snapshots' subtract_referenced picks the
    newest checkpoint, but a concurrent write_checkpoint can land a
    NEWER one (seeded from the unsubtracted set) between that choice
    and the rewrite. The loser's subtraction then lands on a stale
    file; the surviving newest checkpoint still protects the deleted
    paths. Direction matters: that is a disk LEAK (files already gone,
    paths merely shielded), never a sweepable-while-referenced hole —
    and full_scan reclaims the protection set."""
    warehouse = str(tmp_path / "w")
    _, t = _table_with_versions(spark, warehouse, 3)
    first_files = set(t.log.state_at().keys())
    t.overwrite(local_df(spark, [(1, "only")], "k bigint, v string"))
    cp1 = t.log.write_checkpoint()

    # freeze subtract's view of "newest" at cp1, then land cp2 from a
    # second writer before the subtraction is applied
    real_versions = t.log._checkpoint_versions
    t.log._checkpoint_versions = lambda: [cp1]
    t.append(local_df(spark, [(2, "more")], "k bigint, v string"))
    from local_datalakehouse_phase2_spark.lakehouse.log import TransactionLog

    other = TransactionLog(t.log.metadata_dir)
    cp2 = other.write_checkpoint()
    assert cp2 > cp1
    # the racing subtraction rewrites the stale cp1
    t.log.subtract_referenced(first_files)
    t.log._checkpoint_versions = real_versions

    # newest checkpoint still carries the (stale) protection: the
    # fast-path sweep must NOT delete anything still referenced, and
    # the already-deleted-by-expiry shape is only ever a leak here
    cp = t.log._read_checkpoint()
    assert cp["version"] == cp2
    assert first_files <= set(cp["referenced"])  # leaked protection
    res = remove_orphan_files(t, older_than=time.time() - 86401)
    assert res["deleted_files"] == 0
    # full_scan prunes the stale shield exactly like the crashed-expiry
    # case (files still on disk and reachable -> they stay; the SET is
    # recomputed from live state so nothing dangles)
    res = remove_orphan_files(t, older_than=time.time() - 86401, full_scan=True)
    assert res["deleted_files"] == 0
    for rel in first_files:
        assert os.path.exists(os.path.join(t.table_dir, rel))


def test_metadata_folds_read_only_the_suffix(spark, tmp_path):
    """Primitive-level pin of the r16 bounding: a COLD log handle's
    state_at / properties_at / schema_ddl_at / renames / drops /
    write_checkpoint-clamp each read only entries above the newest
    checkpoint, never the full history."""
    from local_datalakehouse_phase2_spark.lakehouse.log import TransactionLog

    warehouse = str(tmp_path / "w")
    _, t = _table_with_versions(spark, warehouse, 15)
    cpv = t.log.write_checkpoint()
    t.append(local_df(spark, [(99, "z")], "k bigint, v string"))

    rio = PathRecordingIO()
    cold = TransactionLog(t.log.metadata_dir, io=rio)
    n_suffix = len([v for v in cold.versions() if v > cpv])
    assert n_suffix == 1

    for op in (
        lambda: cold.state_at(),
        lambda: cold.properties_at(),
        lambda: cold.schema_ddl_at(),
        lambda: cold.renames_upto(),
        lambda: cold.drops_upto(),
        lambda: cold.write_checkpoint(),
    ):
        rio.reads.clear()
        op()
        got = len(set(rio.entry_reads()))
        assert got <= n_suffix, (
            f"{op}: read {got} entry files for a {n_suffix}-entry suffix"
        )
