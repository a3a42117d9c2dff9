"""Row-level changelog reads (Iceberg's create_changelog_view):
insert/delete/update_before/update_after rows per commit, scoped
per-commit diffs, replace-commit transparency, and the SQL procedure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import (
    Lakehouse,
    LakehouseSQL,
    rewrite_data_files,
    rollback_to_snapshot,
)


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def _mk(spark, lo, hi, tag="v"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit(tag), F.col("id")).alias("v")
    )


def _counts(df):
    return {
        (r._change_type, r._change_ordinal): r.n
        for r in df.groupBy("_change_type", "_change_ordinal").agg(F.count("*").alias("n")).collect()
    }


def test_changelog_append_delete_cow(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.cl", schema="k bigint, v string")
    v0 = t.log.latest_version()
    t.append(_mk(spark, 0, 20).coalesce(1))
    t.delete_where("k < 5")
    log = t.read_changelog(v0)
    c = _counts(log)
    assert c[("insert", 0)] == 20
    assert c[("delete", 1)] == 5
    assert set(c) == {("insert", 0), ("delete", 1)}
    # snapshot ids line up with the commits
    snap_ids = {r._commit_snapshot_id for r in log.select("_commit_snapshot_id").distinct().collect()}
    assert len(snap_ids) == 2


def test_changelog_mor_delete_and_update_pairing(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.clm",
        schema="k bigint, v string",
        properties={
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
        },
    )
    t.append(_mk(spark, 0, 30).coalesce(2))
    v1 = t.log.latest_version()
    t.delete_where("k IN (1, 2)")
    t.update_where({"v": "concat('u', k)"}, "k = 10")
    plain = t.read_changelog(v1)
    c = _counts(plain)
    assert c[("delete", 0)] == 2
    assert c[("delete", 1)] == 1 and c[("insert", 1)] == 1  # the update
    paired = t.read_changelog(v1, identifier_columns=["k"])
    cp = _counts(paired)
    assert cp[("delete", 0)] == 2  # no matching inserts: stays delete
    assert cp[("update_before", 1)] == 1 and cp[("update_after", 1)] == 1
    rows = {r._change_type: r.v for r in paired.filter("k = 10").collect()}
    assert rows == {"update_before": "v10", "update_after": "u10"}


def test_changelog_skips_replace_commits(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.clr", schema="k bigint, v string",
        properties={"write.target-file-size-bytes": "2048"},
    )
    v0 = t.log.latest_version()
    t.append(_mk(spark, 0, 50).repartition(4, "k"))
    rewrite_data_files(t, target_file_size_bytes=1 << 20, min_input_files=1)
    log = t.read_changelog(v0)
    c = _counts(log)
    # compaction emitted nothing: one insert batch only
    assert c == {("insert", 0): 50}


def test_changelog_rollback_emits_restores(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.clb", schema="k bigint, v string")
    t.append(_mk(spark, 0, 10).coalesce(1))
    v1 = t.log.latest_version()
    t.append(_mk(spark, 10, 15).coalesce(1))
    v2 = t.log.latest_version()
    rollback_to_snapshot(t, v1)
    log = t.read_changelog(v2)
    c = _counts(log)
    assert c == {("delete", 0): 5}  # the rolled-back append disappears


def test_changelog_sql_procedure(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.clq", schema="k bigint, v string")
    v0 = t.log.latest_version()
    t.append(_mk(spark, 0, 8).coalesce(1))
    t.delete_where("k = 3")
    sql = LakehouseSQL(lake)
    res = sql.sql(
        "CALL nessie.system.create_changelog_view("
        f"table => 'lab.clq', changelog_view => 'clq_changes', "
        f"options => map('start-snapshot-id', '{v0}'), "
        "identifier_columns => array('k'))"
    ).first()
    assert res.changelog_view == "clq_changes"
    got = spark.sql(
        "SELECT _change_type, COUNT(*) AS n FROM clq_changes GROUP BY 1"
    ).collect()
    assert {(r._change_type, r.n) for r in got} == {("insert", 8), ("delete", 1)}
