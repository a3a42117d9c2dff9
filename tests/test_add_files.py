"""add_files adoption (Iceberg's add_files procedure) and the
write.sort-order table property (ALTER TABLE ... WRITE ORDERED BY).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import (
    Lakehouse,
    LakehouseSQL,
    MaintenanceError,
    add_files,
    rewrite_data_files,
)


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def test_add_files_adopts_without_rewrite(spark, lake, tmp_path):
    src = str(tmp_path / "historical")
    _mk(spark, 0, 100).coalesce(2).write.parquet(src)
    lake.create_namespace("lab")
    t = lake.create_table("lab.adopt", schema="k bigint, v string")
    t.append(_mk(spark, 100, 110).coalesce(1))
    res = add_files(t, src)
    assert res["added_files"] == 2 and res["added_records"] == 100
    assert t.read().count() == 110
    # zero-copy on POSIX: adopted files are hard links (same inode)
    adopted = [
        fi for fi in t.log.state_at().values() if "adopted-" in fi.path
    ]
    assert len(adopted) == 2
    src_inodes = {
        os.stat(os.path.join(src, f)).st_ino
        for f in os.listdir(src)
        if f.endswith(".parquet")
    }
    dst_inodes = {
        os.stat(os.path.join(t.table_dir, fi.path)).st_ino for fi in adopted
    }
    assert dst_inodes == src_inodes
    # footer stats entered scan planning
    plan = t.scan_plan([("k", "=", 105)])
    assert plan["files_pruned"] >= 2  # both adopted files prune on k


def test_add_files_rejects_missing_columns(spark, lake, tmp_path):
    src = str(tmp_path / "narrow")
    spark.range(5).select(F.col("id").alias("k")).write.parquet(src)  # no v
    lake.create_namespace("lab")
    t = lake.create_table("lab.adopt2", schema="k bigint, v string")
    with pytest.raises(MaintenanceError, match="lacks table column"):
        add_files(t, src)
    assert t.read().count() == 0  # nothing half-adopted


def test_add_files_then_compaction_migrates_layout(spark, lake, tmp_path):
    src = str(tmp_path / "flat")
    spark.range(0, 60).select(
        F.col("id").alias("k"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("cat"),
    ).coalesce(2).write.parquet(src)
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.adopt3",
        schema="k bigint, cat string",
        properties={"partition.spec": "cat"},
    )
    add_files(t, src)
    # adopted files carry no partition tuple -> never pruned, always read
    assert t.read(filters=[("cat", "=", "c1")]).count() == 20
    rewrite_data_files(t, target_file_size_bytes=1 << 20, min_input_files=1)
    live = list(t.log.state_at().values())
    assert all(fi.partition for fi in live)  # migrated into the spec
    plan = t.scan_plan([("cat", "=", "c1")])
    assert plan["files_pruned_by_partition"] > 0
    assert t.read(filters=[("cat", "=", "c1")]).count() == 20


def test_write_sort_order_tightens_footers(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.so",
        schema="k bigint, v string",
        properties={"write.sort-order": "k"},
    )
    t.append(_mk(spark, 0, 4000).repartition(4))
    files = [fi for fi in t.log.state_at().values()]
    assert len(files) >= 2
    # rows inside each written file must be sorted (row-group stats get
    # tight even when round-robin partitioning keeps file spans wide)
    p = files[0].path
    one = spark.read.parquet(f"{t.table_dir}/{p}").select("k").collect()
    ks = [r.k for r in one]
    assert ks == sorted(ks)


def test_write_sort_order_with_partition_spec(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.sop",
        schema="k bigint, cat string",
        properties={"partition.spec": "cat", "write.sort-order": "k desc"},
    )
    t.append(
        spark.range(0, 300).select(
            F.col("id").alias("k"),
            F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("cat"),
        )
    )
    fi = next(iter(t.log.state_at().values()))
    one = spark.read.parquet(f"{t.table_dir}/{fi.path}").select("k").collect()
    ks = [r.k for r in one]
    assert ks == sorted(ks, reverse=True)
    assert t.read().count() == 300


def test_sql_surfaces(spark, lake, tmp_path):
    src = str(tmp_path / "sqlsrc")
    _mk(spark, 0, 30).coalesce(1).write.parquet(src)
    lake.create_namespace("lab")
    lake.create_table("lab.sqa", schema="k bigint, v string")
    sql = LakehouseSQL(lake)
    res = sql.sql(
        f"CALL nessie.system.add_files(table => 'lab.sqa', source_dir => '{src}')"
    ).first()
    assert res.added_files == 1 and res.added_records == 30
    sql.sql("ALTER TABLE lab.sqa WRITE ORDERED BY (v desc, k)")
    t = lake.table("lab.sqa")
    assert t.properties()["write.sort-order"] == "v desc, k"
    sql.sql("ALTER TABLE lab.sqa WRITE UNORDERED")
    assert t.properties()["write.sort-order"] == ""


def test_adopted_links_are_sweep_safe(spark, lake, tmp_path):
    """A hard link preserves the source's old mtime; the orphan sweep
    floors a file's age at its commit dir's mtime, so staged links of
    an in-flight adoption cannot be swept through the 24h floor even
    though the linked bytes are years old."""
    import os as _os
    import time as _time

    from local_datalakehouse_phase2_spark.lakehouse import remove_orphan_files

    src = str(tmp_path / "old_src")
    _mk(spark, 0, 10).coalesce(1).write.parquet(src)
    old = _time.time() - 3 * 24 * 3600
    for f in _os.listdir(src):
        _os.utime(_os.path.join(src, f), (old, old))
    lake.create_namespace("lab")
    t = lake.create_table("lab.sweep", schema="k bigint, v string")
    add_files(t, src)
    # simulate the mid-adoption window: files linked (old mtime, fresh
    # dir) but the commit not yet visible — roll the log back by hand
    fi = next(iter(t.log.state_at().values()))
    full = _os.path.join(t.table_dir, fi.path)
    head = t.log.latest_version()
    _os.remove(_os.path.join(t.table_dir, "metadata", f"{head:010d}.json"))
    assert remove_orphan_files(t)["deleted_files"] == 0
    assert _os.path.exists(full)  # staged adoption survived the sweep


def test_snapshot_table_procedure(spark, lake, tmp_path):
    from local_datalakehouse_phase2_spark.lakehouse.maintenance import snapshot_table

    src = str(tmp_path / "legacy")
    _mk(spark, 0, 50).coalesce(2).write.parquet(src)
    lake.create_namespace("lab")
    res = snapshot_table(lake, src, "lab.snap")
    assert res["added_files"] == 2 and res["added_records"] == 50
    t = lake.table("lab.snap")
    assert t.read().count() == 50
    assert [f.name for f in t.schema().fields] == ["k", "v"]
    # the source keeps serving its own readers untouched
    assert spark.read.parquet(src).count() == 50
    # failure rolls the table back out (no half-created snapshot table)
    import pytest as _pt

    from local_datalakehouse_phase2_spark.lakehouse import MaintenanceError

    with _pt.raises(Exception):
        snapshot_table(lake, src, "lab.snap")  # already exists


def test_snapshot_sql_procedure(spark, lake, tmp_path):
    src = str(tmp_path / "legacy2")
    _mk(spark, 0, 12).coalesce(1).write.parquet(src)
    lake.create_namespace("lab")
    sql = LakehouseSQL(lake)
    res = sql.sql(
        f"CALL nessie.system.snapshot(table => 'lab.snap2', source_dir => '{src}')"
    ).first()
    assert res.added_records == 12
    assert lake.table("lab.snap2").read().count() == 12


def test_range_mode_under_partition_spec(spark, lake):
    """Range distribution composes with a partition spec: each hive
    partition's files hold disjoint sort-key ranges, so partition
    pruning and stats pruning stack."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.rps",
        schema="k bigint, cat string",
        properties={
            "partition.spec": "cat",
            "write.distribution-mode": "range",
            "write.sort-order": "k",
        },
    )
    # tiny fixture: stop AQE from coalescing the range shuffle into one
    # partition per cat (at real scale the ranges are genuine)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(
            spark.range(0, 2000).select(
                F.pmod(F.col("id") * 2654435761, F.lit(2000)).alias("k"),
                F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("cat"),
            )
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    plan = t.scan_plan([("cat", "=", "c1"), ("k", "=", 42)])
    # partition pruning drops the other cat; stats pruning drops the
    # non-matching ranges within c1 (requires >1 file per partition
    # from the range shuffle)
    assert plan["files_pruned_by_partition"] > 0
    assert plan["files_scanned"] < plan["files_total"] - plan["files_pruned_by_partition"]
    got = t.read(filters=[("cat", "=", "c1"), ("k", "=", 42)]).count()
    want = (
        spark.range(0, 2000)
        .select(
            F.pmod(F.col("id") * 2654435761, F.lit(2000)).alias("k"),
            F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("cat"),
        )
        .filter("cat = 'c1' AND k = 42")
        .count()
    )
    assert got == want


def test_add_files_rejects_incompatible_types(spark, lake, tmp_path):
    """Name-only validation would admit a string-typed file into a
    bigint column: the adopting commit succeeds and every LATER scan
    throws PARQUET_COLUMN_DATA_TYPE_MISMATCH — an unreadable table.
    Footer types must be checked at adopt time."""
    lake.create_namespace("lab")
    t = lake.create_table("lab.typed", schema="k bigint, v string")
    bad = str(tmp_path / "bad")
    spark.range(3).selectExpr("CAST(id AS STRING) AS k", "'x' AS v").write.parquet(bad)
    with pytest.raises(MaintenanceError, match="incompatible column type"):
        add_files(t, bad)
    assert t.read().count() == 0  # nothing committed
    # widening the reader performs is fine: int32 file -> bigint column
    ok = str(tmp_path / "ok")
    spark.range(3).selectExpr("CAST(id AS INT) AS k", "'x' AS v").write.parquet(ok)
    add_files(t, ok)
    assert t.read().count() == 3
    assert t.read().agg(F.sum("k")).first()[0] == 3


def test_add_files_rejects_incompatible_nested_types(spark, lake, tmp_path):
    lake.create_namespace("lab")
    t = lake.create_table("lab.nested", schema="k bigint, emb array<float>")
    bad = str(tmp_path / "badnested")
    spark.range(2).selectExpr(
        "id AS k", "array(CAST(id AS STRING)) AS emb"
    ).write.parquet(bad)
    with pytest.raises(MaintenanceError, match="incompatible column type"):
        add_files(t, bad)
    ok = str(tmp_path / "oknested")
    spark.range(2).selectExpr(
        "id AS k", "array(CAST(id AS FLOAT)) AS emb"
    ).write.parquet(ok)
    add_files(t, ok)
    assert t.read().count() == 2


def test_add_files_widens_nested_element_types(spark, lake, tmp_path):
    """ADVICE r7: the widening map must apply ELEMENT-WISE through
    array/map/struct — Spark's vectorized reader upcasts array<int>
    under array<bigint> (verified on this Spark), so refusing such
    files was over-strict. Struct fields missing from the file are
    still incompatible (they'd silently read all-null)."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.widen",
        schema="k bigint, arr array<bigint>, m map<string,bigint>, s struct<x:bigint,y:double>",
    )
    src = str(tmp_path / "narrow")
    spark.range(3).selectExpr(
        "CAST(id AS INT) AS k",
        "array(CAST(id AS INT)) AS arr",
        "map('a', CAST(id AS INT)) AS m",
        "named_struct('x', CAST(id AS INT), 'y', CAST(id AS FLOAT)) AS s",
    ).write.parquet(src)
    add_files(t, src)
    got = t.read().orderBy("k").collect()
    assert [r.k for r in got] == [0, 1, 2]
    assert got[2].arr == [2] and got[2].m == {"a": 2} and got[2].s.x == 2

    # Struct missing a table field: DELIBERATELY stricter than Iceberg
    # (which null-fills via field-ID mapping — adopted foreign parquet
    # has no field IDs, so absence is indistinguishable from a writer
    # bug; see the add_files docstring). The rejection must name the
    # offending column and both types so the operator can decide
    # between re-export and schema evolution.
    t2 = lake.create_table("lab.widen2", schema="k bigint, s struct<x:bigint,y:double>")
    bad = str(tmp_path / "missingfield")
    spark.range(2).selectExpr(
        "id AS k", "named_struct('x', CAST(id AS INT)) AS s"
    ).write.parquet(bad)
    with pytest.raises(
        MaintenanceError,
        match=r"incompatible column type.*s: file has struct<x:int>, "
        r"table needs struct<x:bigint,y:double>",
    ):
        add_files(t2, bad)
