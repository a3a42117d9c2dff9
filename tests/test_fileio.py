"""FileIO seam (reference S8): the lakehouse metadata layer must be
path-scheme-agnostic.

Three claims, each load-bearing for the object-store story:
1. Every metadata/maintenance file operation goes through the injected
   FileIO — proven by running a full table lifecycle under a recording
   shim and asserting it saw traffic for every operation class.
2. HadoopFileIO (the JVM Hadoop FileSystem route that serves hdfs://,
   s3a://, file:) implements every primitive with the same observable
   behavior as LocalFileIO — proven pairwise on local paths, which
   Hadoop's LocalFileSystem serves through the SAME code path an
   object store would use.
3. The full lifecycle (create/append/delete/compact/expire/orphans)
   produces identical results when the warehouse runs on HadoopFileIO.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import (
    HadoopFileIO,
    Lakehouse,
    LocalFileIO,
    expire_snapshots,
    remove_orphan_files,
    rewrite_data_files,
)


class RecordingFileIO(LocalFileIO):
    """LocalFileIO that counts every call by method name."""

    def __init__(self):
        self.calls: dict[str, int] = {}

    def _note(self, op: str) -> None:
        self.calls[op] = self.calls.get(op, 0) + 1


def _wrap(method_name):
    base = getattr(LocalFileIO, method_name)

    def wrapped(self, *a, **kw):
        self._note(method_name)
        return base(self, *a, **kw)

    return wrapped


for _m in (
    "makedirs listdir walk_files remove_empty_dirs rmtree exists is_dir size "
    "mtime remove read_text write_text_atomic create_exclusive parquet_row_count "
    "parquet_file_stats"
).split():
    setattr(RecordingFileIO, _m, _wrap(_m))


def _lifecycle(spark, warehouse, io):
    """create -> append x3 -> delete -> compact -> expire -> orphans;
    returns (sorted rows, snapshot count) for cross-impl comparison."""
    lake = Lakehouse(spark, warehouse, io=io)
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.t", schema="k bigint, v string", properties={"gc.enabled": "true"}
    )
    for lo in (0, 20, 40):
        t.append(
            spark.range(lo, lo + 20).select(
                F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
            )
        )
    t.delete_where("k % 10 = 0")
    rewrite_data_files(t)
    expire_snapshots(t, retain_last=2)
    remove_orphan_files(t, older_than=time.time() - 86401)
    rows = sorted((r.k, r.v) for r in t.read().collect())
    return rows, len(t.log.entries()), t


def test_lifecycle_runs_entirely_through_injected_io(spark, tmp_path):
    io = RecordingFileIO()
    rows, n_snapshots, _t = _lifecycle(spark, str(tmp_path / "wh"), io)
    assert rows == sorted(
        (k, f"v{k}") for k in range(60) if k % 10 != 0
    )
    assert n_snapshots == 2
    # every operation class the lakehouse layer performs hit the shim
    for op in (
        "makedirs listdir exists read_text write_text_atomic create_exclusive "
        "parquet_file_stats size remove walk_files mtime"
    ).split():
        assert io.calls.get(op, 0) > 0, f"{op} never routed through FileIO: {io.calls}"


@pytest.fixture(scope="module")
def hio(spark):
    return HadoopFileIO(spark)


def test_hadoop_fileio_primitives_match_local(spark, hio, tmp_path):
    lio = LocalFileIO()
    root = str(tmp_path / "prim")
    hio.makedirs(os.path.join(root, "sub"))
    assert lio.is_dir(os.path.join(root, "sub")) and hio.is_dir(root)

    p = os.path.join(root, "a.txt")
    hio.write_text_atomic(p, "hello\nworld")
    assert lio.read_text(p) == hio.read_text(p) == "hello\nworld"
    assert hio.size(p) == lio.size(p) == 11
    assert abs(hio.mtime(p) - lio.mtime(p)) < 2.0

    # exclusive create: first wins, second refuses and leaves content
    q = os.path.join(root, "commit.json")
    assert hio.create_exclusive(q, "first") is True
    assert hio.create_exclusive(q, "second") is False
    assert hio.read_text(q) == "first"

    assert hio.listdir(root) == lio.listdir(root)
    # Hadoop reports file:/abs URIs; compare scheme-independent names
    assert sorted(os.path.basename(f) for f in hio.walk_files(root)) == sorted(
        os.path.basename(f) for f in lio.walk_files(root)
    )

    hio.remove(q)
    assert not lio.exists(q)

    # empty-dir pruning keeps the root
    hio.makedirs(os.path.join(root, "empty1", "empty2"))
    hio.remove_empty_dirs(root)
    assert not lio.exists(os.path.join(root, "empty1"))
    assert lio.exists(p)  # file and root untouched

    hio.rmtree(root)
    assert not lio.exists(root)


def test_hadoop_fileio_parquet_footer_row_count(spark, hio, tmp_path):
    out = str(tmp_path / "pq")
    spark.range(0, 1234).write.parquet(out)
    lio = LocalFileIO()
    files = [f for f in lio.walk_files(out) if f.endswith(".parquet")]
    assert files
    assert sum(hio.parquet_row_count(f) for f in files) == 1234
    assert all(hio.parquet_row_count(f) == lio.parquet_row_count(f) for f in files)
    # footer column stats identical through the Hadoop tail-read path
    assert all(hio.parquet_file_stats(f) == lio.parquet_file_stats(f) for f in files)
    rows, stats = lio.parquet_file_stats(files[0])
    assert rows > 0 and "id" in stats and stats["id"][2] == 0


def test_lifecycle_on_hadoop_fileio_matches_local(spark, tmp_path):
    rows_h, snaps_h, t = _lifecycle(spark, str(tmp_path / "wh_hadoop"), HadoopFileIO(spark))
    rows_l, snaps_l, _ = _lifecycle(spark, str(tmp_path / "wh_local"), LocalFileIO())
    assert rows_h == rows_l
    assert snaps_h == snaps_l
    # metadata written via Hadoop streams is valid JSON readable locally
    assert t.properties().get("gc.enabled") == "true"
    assert t.snapshots().count() == snaps_h
