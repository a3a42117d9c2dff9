"""Partition spec evolution (Iceberg's ALTER TABLE ADD/DROP PARTITION
FIELD): metadata-only spec changes, mixed-spec pruning through the
spec history, bucket-width-change isolation (parameterized pnames),
and compaction migrating old-spec files to the current layout.
Companion half of the format-version 2 capability set
(/root/reference/SPARK_ICEBERG_GUIDE.md:107).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import (
    Lakehouse,
    LakehouseSQL,
    rewrite_data_files,
)


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("cat"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0, 0, 0, CAST(id % 5 AS INT), 0, 0, 0)"
        ).alias("ts"),
    )


def test_add_partition_field_prunes_both_eras(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.ev",
        schema="id bigint, cat string, ts timestamp",
        properties={"partition.spec": "cat"},
    )
    t.append(_mk(spark, 0, 60))
    t.add_partition_field("day(ts)")
    assert [tr.kind for tr in t.partition_spec()] == ["identity", "day"]
    t.append(_mk(spark, 60, 120))
    assert t.read().count() == 120
    # cat filter prunes BOTH eras (all files recorded __p_cat)
    plan = t.scan_plan([("cat", "=", "c1")])
    assert plan["files_pruned_by_partition"] > 0
    got = t.read(filters=[("cat", "=", "c1")]).count()
    assert got == len([i for i in range(120) if i % 3 == 1])
    # ts filter prunes only new-era files; old files scan (degrade-only)
    day = dt.datetime(2024, 1, 3)
    plan2 = t.scan_plan([("ts", ">=", day), ("ts", "<", day + dt.timedelta(days=1))])
    assert 0 < plan2["files_pruned_by_partition"]
    got2 = t.read(
        filters=[("ts", ">=", day), ("ts", "<", day + dt.timedelta(days=1))]
    ).count()
    assert got2 == len([i for i in range(120) if i % 5 == 2])


def test_drop_partition_field_keeps_old_file_pruning(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.dr",
        schema="id bigint, cat string, ts timestamp",
        properties={"partition.spec": "cat, day(ts)"},
    )
    t.append(_mk(spark, 0, 60))
    t.drop_partition_field("day(ts)")
    assert [tr.kind for tr in t.partition_spec()] == ["identity"]
    t.append(_mk(spark, 60, 120))
    # old-era files still prune on ts through the spec history
    day = dt.datetime(2024, 1, 3)
    plan = t.scan_plan([("ts", ">=", day), ("ts", "<", day + dt.timedelta(days=1))])
    assert plan["files_pruned_by_partition"] > 0
    got = t.read(
        filters=[("ts", ">=", day), ("ts", "<", day + dt.timedelta(days=1))]
    ).count()
    assert got == len([i for i in range(120) if i % 5 == 2])
    # dropping the last remaining field -> unpartitioned writes
    t.drop_partition_field("cat")
    assert t.partition_spec() is None
    t.append(_mk(spark, 120, 130))
    assert t.read().count() == 130
    with pytest.raises(ValueError, match="not in spec"):
        t.drop_partition_field("cat")


def test_bucket_width_change_is_isolated(spark, lake):
    """bucket(4, id) -> bucket(8, id): different pname, so the 4-wide
    era's dirs are never pruned with the 8-wide hash."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.bw",
        schema="id bigint, cat string, ts timestamp",
        properties={"partition.spec": "bucket(4, id)"},
    )
    t.append(_mk(spark, 0, 40))
    t.drop_partition_field("bucket(4, id)")
    t.add_partition_field("bucket(8, id)")
    t.append(_mk(spark, 40, 80))
    for probe in (0, 7, 39, 40, 77):
        got = t.read(filters=[("id", "=", probe)]).count()
        assert got == 1, probe
    plan = t.scan_plan([("id", "=", 3)])
    assert plan["files_pruned_by_partition"] > 0
    with pytest.raises(ValueError, match="already in spec"):
        t.add_partition_field("bucket(8, id)")


def test_add_field_validates_source_and_type(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.val", schema="id bigint, cat string, ts timestamp"
    )
    with pytest.raises(ValueError, match="not in schema"):
        t.add_partition_field("nope")
    with pytest.raises(ValueError, match="time transforms"):
        t.add_partition_field("day(cat)")


def test_compaction_migrates_to_current_spec(spark, lake):
    """rewrite_data_files writes its output under the CURRENT spec —
    compaction doubles as the layout-migration tool after evolution
    (Iceberg behaves the same: rewrites use the table's live spec)."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.mig",
        schema="id bigint, cat string, ts timestamp",
        properties={
            "partition.spec": "cat",
            "write.target-file-size-bytes": "4096",
        },
    )
    for lo in (0, 30):
        t.append(_mk(spark, lo, lo + 30))
    t.drop_partition_field("cat")
    t.add_partition_field("day(ts)")
    rewrite_data_files(t, target_file_size_bytes=1 << 20, min_input_files=1)
    live = [fi for fi in t.log.state_at().values() if fi.content == 0]
    assert live and all(
        fi.partition and any(k.startswith("__p_ts_day") for k in fi.partition)
        for fi in live
    )
    assert t.read().count() == 60
    day = dt.datetime(2024, 1, 3)
    plan = t.scan_plan([("ts", ">=", day), ("ts", "<", day + dt.timedelta(days=1))])
    # fully migrated: every non-matching day partition prunes
    assert plan["files_scanned"] < plan["files_total"]


def test_sql_add_drop_partition_field(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.sqe", schema="id bigint, cat string, ts timestamp"
    )
    sql = LakehouseSQL(lake)
    sql.sql("ALTER TABLE lab.sqe ADD PARTITION FIELD cat")
    sql.sql("ALTER TABLE lab.sqe ADD PARTITION FIELD bucket(4, id)")
    assert [tr.kind for tr in t.partition_spec()] == ["identity", "bucket"]
    sql.sql("ALTER TABLE lab.sqe DROP PARTITION FIELD bucket(4, id)")
    assert [tr.kind for tr in t.partition_spec()] == ["identity"]
    from local_datalakehouse_phase2_spark.lakehouse.sql import SqlError

    with pytest.raises(SqlError, match="not in spec"):
        sql.sql("ALTER TABLE lab.sqe DROP PARTITION FIELD bucket(4, id)")


def test_overwrite_partitions_rejects_old_spec_files(spark, lake):
    """INSERT OVERWRITE safety after spec evolution: files written
    under the old spec carry partition tuples WITHOUT the current
    pnames — keying them under the current spec would either miss them
    (silent duplication when their partition is replaced) or match an
    all-null touched partition (data loss). They must hard-stop the
    overwrite until compaction migrates the layout."""
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.evow",
        schema="id bigint, cat string, ts timestamp",
        properties={"partition.spec": "cat"},
    )
    t.append(_mk(spark, 0, 30))  # old-spec files: only __p_cat
    t.add_partition_field("day(ts)")  # current spec: cat, day(ts)
    with pytest.raises(ValueError, match="current-spec partition tuple"):
        t.overwrite_partitions(_mk(spark, 0, 5))
    # compaction migrates everything to the current layout; then the
    # dynamic overwrite plans and commits normally
    rewrite_data_files(t, strategy="binpack", min_input_files=1)
    before_untouched = t.read().filter("cat <> 'c0'").count()
    # spec is now (cat, day(ts)): the backfill (ids 0 and 3 of
    # range(0,5), days 01-01 and 01-04) replaces only those two
    # (c0, day) tuples; c0 rows on other days survive
    t.overwrite_partitions(_mk(spark, 0, 5).filter("cat = 'c0'"))
    r = t.read()
    assert r.filter("cat <> 'c0'").count() == before_untouched
    replaced_days = "('2024-01-01', '2024-01-04')"
    assert r.filter(f"cat = 'c0' AND to_date(ts) IN {replaced_days}").count() == 2
    assert r.filter(f"cat = 'c0' AND to_date(ts) NOT IN {replaced_days}").count() == 6


def test_legacy_pname_alias_still_prunes(spark, lake):
    """Bucket dirs written before the parameter was encoded in the
    pname (`__p_id_bucket` vs `__p_id_bucket16`) keep pruning when the
    spec union has exactly one bucket transform on that source."""
    from local_datalakehouse_phase2_spark.lakehouse.partition import (
        parse_spec,
        prune_state,
    )

    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.legacy",
        schema="id bigint, cat string, ts timestamp",
        properties={"partition.spec": "bucket(4, id)"},
    )
    t.append(_mk(spark, 0, 40))
    state = t.log.state_at()
    spec = parse_spec("bucket(4, id)")
    pname = spec[0].pname  # __p_id_bucket4
    legacy = "__p_id_bucket"
    import dataclasses

    legacy_state = {
        p: dataclasses.replace(
            fi, partition={legacy: v for _, v in fi.partition.items()}
        )
        for p, fi in state.items()
        if fi.partition and pname in fi.partition
    }
    assert legacy_state
    kept, pruned = prune_state(legacy_state, [("id", "==", 7)], spec)
    assert pruned > 0  # legacy dirs still prune via the alias
    import zlib

    want = zlib.crc32(b"7") % 4
    assert all(fi.partition[legacy] == str(want) for fi in kept.values())
    # ambiguity guard: two bucket widths on the same source => no alias
    two = parse_spec("bucket(4, id)") + parse_spec("bucket(8, id)")
    kept2, pruned2 = prune_state(legacy_state, [("id", "==", 7)], two)
    assert pruned2 == 0  # ambiguous legacy name degrades to scan
