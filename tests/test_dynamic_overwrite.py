"""Dynamic partition overwrite (Iceberg ReplacePartitions / Spark
dynamic partitionOverwriteMode), INSERT OVERWRITE routing, and the
ancestors_of procedure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import (
    CommitConflictError,
    Lakehouse,
    LakehouseSQL,
    add_files,
    rollback_to_snapshot,
)


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def _mk(spark, lo, hi, tag="v"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("cat"),
        F.concat(F.lit(tag), F.col("id")).alias("v"),
    )


def test_dynamic_overwrite_replaces_only_touched(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.dyn",
        schema="k bigint, cat string, v string",
        properties={"partition.spec": "cat"},
    )
    t.append(_mk(spark, 0, 90))
    # backfill partition c1 only, with new values and fewer rows
    repl = spark.createDataFrame(
        [(1000 + i, "c1", f"new{i}") for i in range(5)], "k bigint, cat string, v string"
    )
    e = t.overwrite_partitions(repl)
    assert e.operation == "overwrite"
    r = t.read()
    assert r.filter("cat = 'c1'").count() == 5  # replaced
    assert r.filter("cat = 'c0'").count() == 30  # untouched
    assert r.filter("cat = 'c2'").count() == 30
    assert r.filter("v like 'new%'").count() == 5
    # untouched partitions kept their FILES (no rewrite)
    kept = {
        fi.path
        for fi in t.log.state_at().values()
        if fi.partition and fi.partition.get("__p_cat") in ("c0", "c2")
    }
    assert kept and all("adopted" not in p for p in kept)


def test_dynamic_overwrite_conflicts_with_racing_append(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.race",
        schema="k bigint, cat string, v string",
        properties={"partition.spec": "cat"},
    )
    t.append(_mk(spark, 0, 30))
    repl = spark.createDataFrame(
        [(100, "c1", "new")], "k bigint, cat string, v string"
    )
    # simulate a concurrent append landing between plan and commit by
    # injecting it through extra_validation's view: plan first, then
    # append, then commit via the same public call (the validation
    # re-reads live state inside the commit loop)
    import local_datalakehouse_phase2_spark.lakehouse.table as tbl

    orig = tbl.LakehouseTable._write_files
    done = {"hit": False}

    def hooked(self, df, **kw):
        files = orig(self, df, **kw)
        if not done["hit"] and self.identifier == "lab.race":
            done["hit"] = True
            # racing append into the touched partition
            t2 = lake.table("lab.race")
            tbl.LakehouseTable._write_files = orig
            t2.append(
                spark.createDataFrame(
                    [(200, "c1", "racer")], "k bigint, cat string, v string"
                )
            )
            tbl.LakehouseTable._write_files = hooked
        return files

    tbl.LakehouseTable._write_files = hooked
    try:
        with pytest.raises(CommitConflictError, match="concurrent write"):
            t.overwrite_partitions(repl)
    finally:
        tbl.LakehouseTable._write_files = orig
    # the racer's row survived; the failed overwrite changed nothing
    assert t.read().filter("v = 'racer'").count() == 1
    assert t.read().filter("v = 'new'").count() == 0


def test_dynamic_overwrite_guards(spark, lake, tmp_path):
    lake.create_namespace("lab")
    t0 = lake.create_table("lab.unpart", schema="k bigint, v string")
    with pytest.raises(ValueError, match="partitioned table"):
        t0.overwrite_partitions(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    t = lake.create_table(
        "lab.guard",
        schema="k bigint, cat string, v string",
        properties={"partition.spec": "cat"},
    )
    # unaddressed (adopted) files block partition-addressed replacement
    src = str(tmp_path / "src")
    _mk(spark, 0, 10).coalesce(1).write.parquet(src)
    add_files(t, src)
    with pytest.raises(ValueError, match="no current-spec partition tuple"):
        t.overwrite_partitions(
            spark.createDataFrame([(1, "c1", "x")], "k bigint, cat string, v string")
        )
    # ambiguous null/empty-string partition of a string identity column
    t2 = lake.create_table(
        "lab.guard2",
        schema="k bigint, cat string, v string",
        properties={"partition.spec": "cat"},
    )
    t2.append(_mk(spark, 0, 10))
    with pytest.raises(ValueError, match="ambiguous"):
        t2.overwrite_partitions(
            spark.createDataFrame([(1, None, "x")], "k bigint, cat string, v string")
        )


def test_insert_overwrite_sql_routing(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.iow",
        schema="k bigint, cat string, v string",
        properties={"partition.spec": "cat"},
    )
    t.append(_mk(spark, 0, 30))
    sql = LakehouseSQL(lake)
    # Spark's default partitionOverwriteMode=static: INSERT OVERWRITE
    # replaces the WHOLE table, even partitioned — matching what the
    # reference stack (which never overrides the conf) would do
    sql.sql(
        "INSERT OVERWRITE lab.iow VALUES (900, 'c2', 'ow1'), (901, 'c2', 'ow2')"
    )
    r = t.read()
    assert r.count() == 2
    assert r.filter("cat = 'c0'").count() == 0  # static: c0 gone too
    # dynamic mode (session conf opt-in): only touched partitions replaced
    t.append(_mk(spark, 0, 30))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        sql.sql(
            "INSERT OVERWRITE lab.iow VALUES (902, 'c1', 'dyn1'), (903, 'c1', 'dyn2')"
        )
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    r = t.read()
    assert r.filter("cat = 'c1'").count() == 2  # dynamic: only c1 replaced
    assert r.filter("cat = 'c0'").count() == 10
    assert r.filter("cat = 'c2'").count() == 12  # 10 + the 2 static rows
    # unpartitioned: full replacement in either mode
    u = lake.create_table("lab.iow2", schema="k bigint, v string")
    u.append(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"))
    sql.sql("INSERT OVERWRITE lab.iow2 VALUES (9, 'z')")
    assert [tuple(r) for r in u.read().collect()] == [(9, "z")]


def test_ancestors_of_procedure(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.anc", schema="k bigint, v string")
    t.append(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    v1 = t.log.latest_version()
    t.append(spark.createDataFrame([(2, "b")], "k bigint, v string"))
    v2 = t.log.latest_version()
    rollback_to_snapshot(t, v1)
    head = t.log.latest_version()
    sql = LakehouseSQL(lake)
    rows = sql.sql("CALL nessie.system.ancestors_of(table => 'lab.anc')").collect()
    chain = [r.snapshot_id for r in rows]
    assert chain[0] == head and v1 in chain and v2 not in chain
