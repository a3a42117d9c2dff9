"""Partition specs (Iceberg-style transforms; lakehouse/partition.py).

The reference's Iceberg tables get hidden partitioning from transforms
(`PARTITIONED BY (days(ts), bucket(16, id))`); these tests cover the
transform algebra, the hive-layout write path, metadata partition
pruning (incl. the bucket-hash pruning stats can never do), null
partitions, per-partition compaction, and the SQL surface.
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
from local_datalakehouse_phase2_spark.lakehouse.partition import (
    HIVE_NULL,
    PartitionSpecError,
    Transform,
    parse_spec,
)


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


# ---- transform algebra (no Spark) --------------------------------------


def test_parse_spec_grammar():
    spec = parse_spec("days(ts), bucket(16, id), truncate(4, name), region")
    assert [(t.kind, t.source, t.param) for t in spec] == [
        ("day", "ts", None),
        ("bucket", "id", 16),
        ("truncate", "name", 4),
        ("identity", "region", None),
    ]
    assert spec[0].pname == "__p_ts_day"
    assert spec[3].pname == "__p_region"
    for bad in ("days()", "bucket(x, id)", "no pe(c)", ""):
        with pytest.raises(PartitionSpecError):
            parse_spec(bad)
    with pytest.raises(PartitionSpecError, match="duplicate"):
        parse_spec("region, region")


def test_transform_literal_values():
    day = Transform("day", "ts")
    assert day.literal_value(dt.datetime(2024, 3, 5, 7)) == "2024-03-05"
    assert day.literal_value(dt.date(2024, 3, 5)) == "2024-03-05"
    assert day.literal_value("2024-03-05") is None  # string: not provable
    hour = Transform("hour", "ts")
    assert hour.literal_value(dt.date(2024, 3, 5)) is None  # date has no hour
    tr = Transform("truncate", "v", 3)
    assert tr.literal_value("abcdef") == "abc"
    assert tr.literal_value(17) == "15"
    assert tr.literal_value(-1) == "-3"  # floors toward -inf (Iceberg)
    b = Transform("bucket", "k", 8)
    assert b.literal_value(5) == b.literal_value(5)
    assert b.literal_value(None) is None


def test_partition_may_match_rules():
    ident = Transform("identity", "g")
    assert ident.may_match("=", 3, "3")
    assert not ident.may_match("=", 3, "4")
    assert not ident.may_match("!=", 3, "3")  # file holds ONLY value 3
    assert ident.may_match("<", 5, "4") and not ident.may_match("<", 5, "5")
    assert ident.may_match("is_null", None, HIVE_NULL)
    assert not ident.may_match("=", 3, HIVE_NULL)
    day = Transform("day", "ts")
    v = dt.datetime(2024, 3, 5, 12)
    assert day.may_match("<", v, "2024-03-05")  # mid-day literal: inclusive
    assert not day.may_match("<", v, "2024-03-06")
    # midnight literal: the boundary day provably holds no earlier row
    assert not day.may_match("<", dt.datetime(2024, 3, 5), "2024-03-05")
    assert day.may_match("<", dt.datetime(2024, 3, 5), "2024-03-04")
    assert day.may_match(">", v, "2024-03-05")
    assert not day.may_match(">", v, "2024-03-04")
    assert day.may_match("!=", v, "2024-03-05")  # derived: proves nothing
    b = Transform("bucket", "k", 8)
    my = b.literal_value(42)
    assert b.may_match("=", 42, my)
    other = str((int(my) + 1) % 8)
    assert not b.may_match("=", 42, other)
    assert b.may_match("<", 42, other)  # hash order meaningless
    assert b.may_match("=", 42, "50%3A")  # escaped dir value: scan


# ---- end-to-end --------------------------------------------------------


def _mk_events(spark, n=400):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (
            F.lit("2024-03-01").cast("timestamp_ntz")
            + (F.col("id") % 4).cast("int") * F.expr("INTERVAL 1 DAY")
        ).alias("ts"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )


def test_partitioned_write_prune_read(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.p1",
        schema="k bigint, ts timestamp_ntz, v string",
        partition_by="day(ts), bucket(4, k)",
    )
    df = _mk_events(spark)
    t.append(df)
    state = t.log.state_at()
    assert len(state) == 16  # 4 days x 4 buckets, one file each
    assert all(
        set(fi.partition) == {"__p_ts_day", "__p_k_bucket4"} for fi in state.values()
    )
    # day pruning
    flt = [("ts", ">=", dt.datetime(2024, 3, 2)), ("ts", "<", dt.datetime(2024, 3, 3))]
    plan = t.scan_plan(flt)
    assert plan["files_scanned"] == 4 and plan["files_pruned_by_partition"] == 12
    expect = df.filter((F.col("ts") >= "2024-03-02") & (F.col("ts") < "2024-03-03")).count()
    assert t.read(filters=flt).count() == expect
    # bucket pruning: something stats min/max cannot do (hash equality)
    plan2 = t.scan_plan([("k", "=", 7)])
    assert plan2["files_pruned_by_partition"] >= 12  # 3 of 4 buckets gone
    assert t.read(filters=[("k", "=", 7)]).count() == 1
    # the source columns survive in the data files (derived __p_ copies
    # partition the layout; reads of leaf files keep every table column)
    assert t.read().columns == ["k", "ts", "v"]
    assert t.read().count() == 400


def test_partition_null_values(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.pn", schema="k bigint, g string", partition_by="g"
    )
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b"), (4, None)], "k bigint, g string"
        )
    )
    state = t.log.state_at()
    assert any(
        fi.partition and fi.partition.get("__p_g") == HIVE_NULL
        for fi in state.values()
    )
    plan = t.scan_plan([("g", "is_null", None)])
    assert plan["files_scanned"] == 1
    assert sorted(r.k for r in t.read(filters=[("g", "is_null", None)]).collect()) == [2, 4]
    plan2 = t.scan_plan([("g", "=", "a")])
    assert plan2["files_scanned"] == 1
    assert t.read(filters=[("g", "=", "a")]).count() == 1


def test_partitioned_mor_delete_and_compaction(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.pm",
        schema="k bigint, ts timestamp_ntz, v string",
        partition_by="day(ts)",
        properties={"write.delete.mode": "merge-on-read"},
    )
    df = _mk_events(spark)
    t.append(df.filter("k < 200"))
    t.append(df.filter("k >= 200"))
    t.delete_where("k % 50 = 0")
    assert t.read().count() == 392
    res = rewrite_data_files(t, target_file_size_bytes=134217728, min_input_files=1)
    # per-partition groups: 4 day partitions, 2 files each
    assert res["file_groups"] == 4
    assert res["folded_delete_files"] >= 1
    st = t.log.state_at()
    assert all(fi.content == 0 for fi in st.values())
    assert all(fi.partition for fi in st.values())  # dirs survive compaction
    assert t.read().count() == 392
    # pruning still works on the compacted layout
    flt = [("ts", ">=", dt.datetime(2024, 3, 2)), ("ts", "<", dt.datetime(2024, 3, 3))]
    assert t.scan_plan(flt)["files_scanned"] == 1


def test_update_and_merge_keep_partitions(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.pu", schema="k bigint, g bigint, v string", partition_by="g"
    )
    t.append(
        spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g"), F.lit("x").alias("v")
        )
    )
    t.update_where({"v": "'y'"}, "k < 10")  # COW rewrite through partition writer
    assert t.read().filter("v = 'y'").count() == 10
    assert all(fi.partition for fi in t.log.state_at().values())
    src = spark.createDataFrame([(5, 0, "m"), (200, 0, "n")], "k bigint, g bigint, v string")
    t.merge(src, ["k"])
    assert t.read().count() == 101
    assert all(fi.partition for fi in t.log.state_at().values() if fi.content == 0)
    # a row whose partition column CHANGED moves partitions on update
    t.update_where({"g": "4"}, "k = 5")
    moved = [
        fi.partition["__p_g"]
        for fi in t.log.state_at().values()
        if fi.content == 0 and fi.stats and fi.stats.get("k", [None])[0] == 5
           and fi.stats.get("k", [None, None])[1] == 5
    ]
    assert t.read(filters=[("g", "=", 4)]).filter("k = 5").count() == 1


def test_sql_partitioned_by_and_partitions_view(spark, lake):
    q = LakehouseSQL(lake, catalog_name="nessie")
    q.sql("CREATE NAMESPACE nessie.lab")
    q.sql(
        "CREATE TABLE nessie.lab.psql (k BIGINT, g STRING) "
        "PARTITIONED BY (g) TBLPROPERTIES ('x'='1')"
    )
    q.sql("INSERT INTO nessie.lab.psql VALUES (1,'a'), (2,'b'), (3,'a')")
    rows = q.sql(
        "SELECT partition['__p_g'] AS g, file_count, record_count "
        "FROM nessie.lab.psql.partitions ORDER BY g"
    ).collect()
    assert [(r.g, r.file_count, r.record_count) for r in rows] == [
        ("a", 1, 2),
        ("b", 1, 1),
    ]
    # CTAS with PARTITIONED BY
    q.sql(
        "CREATE TABLE nessie.lab.psql2 PARTITIONED BY (bucket(2, k)) "
        "AS SELECT k FROM nessie.lab.psql"
    )
    t2 = lake.table("lab.psql2")
    assert t2.read().count() == 3
    assert len({(fi.partition or {}).get("__p_k_bucket2") for fi in t2.log.state_at().values()}) <= 2


def test_partition_spec_validation(spark, lake):
    lake.create_namespace("lab")
    with pytest.raises(Exception, match="not in schema"):
        lake.create_table(
            "lab.bad", schema="k bigint", partition_by="day(nope)"
        )


def test_partition_pruning_never_loses_rows(spark, lake):
    """Property sweep (review batch 6, finding 5): filtered partitioned
    reads must equal a full-scan filter for every supported op —
    including hive-escaped dir values ('a=b', '100%', spaces, unicode)
    and the empty-string/NULL conflation in __HIVE_DEFAULT_PARTITION__
    (Spark's hive writer puts ''-valued identity rows in the null dir;
    pruning that treated it as null-only silently dropped them)."""
    from local_datalakehouse_phase2_spark.lakehouse.pruning import residual_expr

    lake.create_namespace("lab")
    vals = ["plain", "with space", "a=b", "sl/ash", "unié", "", None, "100%"]
    rows = [(i - 50, vals[i % len(vals)], f"p{i}") for i in range(200)]
    t = lake.create_table(
        "lab.prop",
        schema="k bigint, g string, v string",
        partition_by="g, bucket(5, k)",
    )
    t.append(spark.createDataFrame(rows, "k bigint, g string, v string"))
    full = t.read()
    cases = []
    for g in vals:
        if g is None:
            cases.append([("g", "is_null", None)])
        else:
            cases.append([("g", "=", g)])
            cases.append([("g", "!=", g)])
    for k in (-50, -1, 0, 7, 149, 999):
        cases.append([("k", "=", k)])
        cases.append([("k", "<", k)])
        cases.append([("k", ">=", k)])
    cases.append([("g", "in", ["plain", "a=b"]), ("k", ">", 0)])
    cases.append([("g", "in", ["", "plain"])])
    cases.append([("g", "not_null", None)])
    for flt in cases:
        got = sorted(tuple(r) for r in t.read(filters=flt).collect())
        want = sorted(tuple(r) for r in full.filter(residual_expr(flt)).collect())
        assert got == want, flt


def test_time_transform_requires_temporal_column(spark, lake):
    """day(string_col) would route uncastable values into the null
    partition and mis-prune them — rejected at create."""
    lake.create_namespace("lab")
    with pytest.raises(Exception, match="date/timestamp"):
        lake.create_table(
            "lab.badtt", schema="k bigint, s string", partition_by="day(s)"
        )
    with pytest.raises(Exception, match="explicit schema"):
        lake.create_table("lab.noschema", partition_by="g")
