"""DDL on a catalog branch + catalog-wide tags (round 12; VERDICT r11
items 2 and 4). Nessie refs version the CATALOG: a table created on a
branch is invisible on main and publishes atomically at the merge's
marker flip; a branch drop tombstones now and removes at merge; a tag
pins the whole warehouse immutably for reproducible reads."""

from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    CatalogError,
    CatalogRefError,
    CommitConflictError,
    Lakehouse,
    LakehouseSQL,
    SqlError,
    expire_snapshots,
    rewrite_data_files,
)


def _df(spark, *rows):
    return spark.createDataFrame(list(rows), "k bigint, v string")


def _lake(spark, tmp_path, name="w"):
    lake = Lakehouse(spark, str(tmp_path / name))
    lake.create_namespace("lab")
    t = lake.create_table("lab.base", schema="k bigint, v string")
    t.append(_df(spark, (1, "m1")).coalesce(1))
    return lake


def _rows(lake, ident, ref=None):
    return {tuple(r) for r in lake.read(ident, catalog_ref=ref).collect()}


# ---- CREATE TABLE on a branch ------------------------------------------


def test_create_on_branch_invisible_on_main(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    t = lake.create_table_on_branch(
        "lab.newt", "etl", schema="k bigint, v string",
        properties={"owner": "etl-job"},
    )
    # branch sees it (empty, then written on the branch)
    assert _rows(lake, "lab.newt", ref="etl") == set()
    lake.append("lab.newt", _df(spark, (7, "b7")), catalog_ref="etl")
    assert _rows(lake, "lab.newt", ref="etl") == {(7, "b7")}
    # main does NOT: reads refuse, listings exclude, creates are blocked
    with pytest.raises(CatalogError, match="does not exist on main"):
        lake.read("lab.newt")
    assert "newt" not in lake.tables("lab")
    with pytest.raises(CatalogError, match="held by a catalog-branch"):
        lake.create_table("lab.newt", schema="k bigint")
    assert t.log.latest_main_version() is None


def test_create_on_branch_publishes_at_merge(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.create_table_on_branch(
        "lab.newt", "etl", schema="k bigint, v string",
        properties={"owner": "etl-job"},
    )
    lake.append("lab.newt", _df(spark, (7, "b7")), catalog_ref="etl")
    res = lake.merge_catalog_branch("etl")
    assert res["status"] == "committed"
    assert "lab.newt" in res["tables"]
    # one flip: the table now exists on main, complete with metadata
    assert _rows(lake, "lab.newt") == {(7, "b7")}
    assert "newt" in lake.tables("lab")
    t = lake.table("lab.newt")
    assert t.properties().get("owner") == "etl-job"
    assert t.schema() is not None and [f.name for f in t.schema().fields] == ["k", "v"]
    # record graduated the table to an ordinary pin
    rec = lake.catalog_branches()["etl"]
    assert "lab.newt" not in rec.get("created", {})
    assert rec["pins"]["lab.newt"] >= 0
    # second merge is a no-op
    assert lake.merge_catalog_branch("etl")["merged_tables"] == 0


def test_create_on_branch_aborts_with_the_whole_merge(spark, tmp_path):
    """All-or-nothing: if ANOTHER member conflicts, the branch-created
    table must not publish either."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.create_table_on_branch("lab.newt", "etl", schema="k bigint, v string")
    lake.append("lab.newt", _df(spark, (7, "b7")), catalog_ref="etl")
    # make lab.base conflict: branch overwrite loses to a main overwrite
    lake.overwrite("lab.base", _df(spark, (1, "m1")), catalog_ref="etl")
    lake.table("lab.base").overwrite(_df(spark, (9, "m9")))
    with pytest.raises(CommitConflictError):
        lake.merge_catalog_branch("etl")
    with pytest.raises(CatalogError, match="does not exist on main"):
        lake.read("lab.newt")
    assert _rows(lake, "lab.newt", ref="etl") == {(7, "b7")}  # branch intact


def test_drop_branch_removes_branch_created_table(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.create_table_on_branch("lab.newt", "etl", schema="k bigint, v string")
    lake.drop_branch("etl")
    with pytest.raises(CatalogError, match="does not exist"):
        lake.table("lab.newt", any_lineage=True)
    # the name is free again
    lake.create_table("lab.newt", schema="k bigint, v string")


# ---- DROP TABLE on a branch --------------------------------------------


def test_drop_on_branch_tombstone_and_publish(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.drop_table_on_branch("lab.base", "etl")
    # invisible on the ref, still on main
    with pytest.raises(CatalogRefError, match="dropped on catalog ref"):
        lake.read("lab.base", catalog_ref="etl")
    assert _rows(lake, "lab.base") == {(1, "m1")}
    res = lake.merge_catalog_branch("etl")
    assert res["dropped_tables"] == 1
    with pytest.raises(CatalogError, match="does not exist"):
        lake.read("lab.base")
    assert "base" not in lake.tables("lab")


def test_drop_on_branch_conflicts_with_main_commit(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.drop_table_on_branch("lab.base", "etl")
    lake.table("lab.base").append(_df(spark, (2, "m2")))  # main moves
    with pytest.raises(CommitConflictError, match="dropped on the branch"):
        lake.merge_catalog_branch("etl")
    assert _rows(lake, "lab.base") == {(1, "m1"), (2, "m2")}  # intact


def test_drop_created_table_on_branch_vanishes_now(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.create_table_on_branch("lab.newt", "etl", schema="k bigint, v string")
    lake.drop_table_on_branch("lab.newt", "etl")
    with pytest.raises(CatalogRefError, match="does not exist on catalog ref"):
        lake.read("lab.newt", catalog_ref="etl")
    lake.create_table("lab.newt", schema="k bigint, v string")  # name free


# ---- SQL surface ---------------------------------------------------------


def test_sql_create_drop_table_under_use_reference(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    sql = LakehouseSQL(lake, catalog_name="nessie")
    sql.sql("CALL nessie.system.create_branch(name => 'etl')")
    sql.sql("USE REFERENCE etl")
    sql.sql(
        "CREATE TABLE nessie.lab.newt (k BIGINT, v STRING) USING iceberg "
        "TBLPROPERTIES ('owner'='etl-job')"
    )
    sql.sql("INSERT INTO nessie.lab.newt VALUES (7, 'b7')")
    shown = {
        r.tableName for r in sql.sql("SHOW TABLES IN nessie.lab").collect()
    }
    assert "newt" in shown
    sql.sql("USE REFERENCE main")
    shown_main = {
        r.tableName for r in sql.sql("SHOW TABLES IN nessie.lab").collect()
    }
    assert "newt" not in shown_main
    sql.sql("CALL nessie.system.merge_catalog_branch(name => 'etl')")
    assert sql.sql("SELECT count(*) AS n FROM nessie.lab.newt").first().n == 1
    # DROP TABLE under the ref tombstones; ALTER stays refused
    sql.sql("USE REFERENCE etl")
    with pytest.raises(SqlError, match="not supported under USE REFERENCE"):
        sql.sql("ALTER TABLE nessie.lab.newt SET TBLPROPERTIES ('x'='y')")
    sql.sql("DROP TABLE nessie.lab.newt")
    shown = {
        r.tableName for r in sql.sql("SHOW TABLES IN nessie.lab").collect()
    }
    assert "newt" not in shown


def test_sql_ctas_under_use_reference(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    sql = LakehouseSQL(lake, catalog_name="nessie")
    sql.sql("CALL nessie.system.create_branch(name => 'etl')")
    sql.sql("USE REFERENCE etl")
    sql.sql(
        "CREATE TABLE nessie.lab.ct AS SELECT id AS k, CAST(id*2 AS BIGINT) AS d "
        "FROM RANGE(0, 5)"
    )
    assert sql.sql("SELECT count(*) AS n FROM nessie.lab.ct").first().n == 5
    sql.sql("USE REFERENCE main")
    with pytest.raises((SqlError, Exception)):
        sql.sql("SELECT count(*) FROM nessie.lab.ct").collect()


# ---- catalog-wide tags ---------------------------------------------------


def test_tag_is_immutable_and_survives_churn(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    t2 = lake.create_table("lab.t2", schema="k bigint, v string")
    t2.append(
        spark.createDataFrame([(i, f"x{i}") for i in range(20)], "k bigint, v string")
        .repartition(4, "k")
    )
    lake.create_tag("train-v1")
    before_base = _rows(lake, "lab.base", ref="train-v1")
    before_t2 = _rows(lake, "lab.t2", ref="train-v1")

    # churn: appends, compaction, expiry
    lake.table("lab.base").append(_df(spark, (2, "m2")))
    t2.append(_df(spark, (99, "late")))
    rewrite_data_files(t2, target_file_size_bytes=134217728)
    expire_snapshots(t2, retain_last=1)
    expire_snapshots(lake.table("lab.base"), retain_last=1)

    assert _rows(lake, "lab.base", ref="train-v1") == before_base == {(1, "m1")}
    assert _rows(lake, "lab.t2", ref="train-v1") == before_t2
    assert len(before_t2) == 20

    # writes / merge / rebase refuse
    with pytest.raises(CatalogRefError, match="immutable"):
        lake.append("lab.base", _df(spark, (3, "x")), catalog_ref="train-v1")
    with pytest.raises(CatalogRefError, match="immutable"):
        lake.merge_catalog_branch("train-v1")
    with pytest.raises(CatalogRefError, match="immutable"):
        lake.rebase_catalog_branch("train-v1")
    with pytest.raises(CatalogRefError, match="immutable"):
        lake.create_table_on_branch("lab.nope", "train-v1", schema="k bigint")
    with pytest.raises(CatalogRefError, match="immutable"):
        lake.drop_table_on_branch("lab.base", "train-v1")


def test_tag_sql_surface(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    sql = LakehouseSQL(lake, catalog_name="nessie")
    sql.sql("CALL nessie.system.create_tag(name => 'train-v1')")
    tags = {r.tag for r in sql.sql("SHOW TAGS").collect()}
    assert tags == {"train-v1"}
    branches = {r.ref for r in sql.sql("SHOW BRANCHES").collect()}
    assert "train-v1" not in branches
    # a tag is a readable session ref; writes through it refuse
    sql.sql("USE REFERENCE train-v1")
    lake.table("lab.base").append(_df(spark, (2, "m2")))
    assert (
        sql.sql("SELECT count(*) AS n FROM nessie.lab.base").first().n == 1
    )  # pinned read, not head
    with pytest.raises(SqlError, match="immutable"):
        sql.sql("INSERT INTO nessie.lab.base VALUES (3, 'x')")
    sql.sql("USE REFERENCE main")
    sql.sql("CALL nessie.system.drop_tag(name => 'train-v1')")
    assert sql.sql("SHOW TAGS").count() == 0


# ---- crash atomicity for ref DDL merges ----------------------------------


def test_crash_between_stage_and_marker_aborts_created_table(
    spark, tmp_path, monkeypatch
):
    """Crash after staging the created table's merge entry but BEFORE
    the marker: recovery must decide ABORTED — the table stays
    branch-only, main unchanged."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.create_table_on_branch("lab.newt", "etl", schema="k bigint, v string")
    lake.append("lab.newt", _df(spark, (7, "b7")), catalog_ref="etl")

    from local_datalakehouse_phase2_spark.lakehouse.catalog_refs import CatalogRefs

    class Boom(RuntimeError):
        pass

    def crash(self, txn_id, status, reanchor):
        raise Boom("crash before marker")

    monkeypatch.setattr(CatalogRefs, "_decide", crash)
    with pytest.raises(Boom):
        lake.merge_catalog_branch("etl")
    monkeypatch.undo()

    # recovery path: next lock holder voids the pending merge
    with pytest.raises(CatalogError, match="does not exist on main"):
        lake.read("lab.newt")
    res = lake.merge_catalog_branch("etl")  # runs _recover then merges clean
    assert res["status"] == "committed"
    assert _rows(lake, "lab.newt") == {(7, "b7")}


def test_crash_after_marker_recovers_published_drop(spark, tmp_path, monkeypatch):
    """Crash AFTER the committed marker but before bookkeeping: the
    merge IS published — recovery must finish the physical drop."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.drop_table_on_branch("lab.base", "etl")

    from local_datalakehouse_phase2_spark.lakehouse.catalog_refs import CatalogRefs

    class Boom(RuntimeError):
        pass

    real = CatalogRefs._apply_reanchor

    def crash(self, record, reanchor):
        raise Boom("crash after marker")

    monkeypatch.setattr(CatalogRefs, "_apply_reanchor", crash)
    with pytest.raises(Boom):
        lake.merge_catalog_branch("etl")
    monkeypatch.setattr(CatalogRefs, "_apply_reanchor", real)

    # any next catalog-ref operation recovers and finishes the drop
    lake.merge_catalog_branch("etl")
    with pytest.raises(CatalogError, match="does not exist"):
        lake.read("lab.base")
    assert "base" not in lake.tables("lab")


# ---- drop vs ref pins (r12 late self-review) ----------------------------


def test_drop_table_refused_while_ref_pins_it(spark, tmp_path):
    """A main-side DROP TABLE must not tear a table out from under a
    catalog ref: the tag's forever-stable read (and a branch's fork
    pin) depend on the directory existing. Dropping the ref releases
    the guard."""
    lake = _lake(spark, tmp_path)
    lake.create_tag("train")
    with pytest.raises(CatalogError, match="pinned by catalog ref"):
        lake.drop_table("lab.base")
    assert _rows(lake, "lab.base", ref="train") == {(1, "m1")}
    lake.create_branch("etl")
    lake.drop_tag("train")
    with pytest.raises(CatalogError, match="pinned by catalog ref"):
        lake.drop_table("lab.base")  # the branch fork pin still holds
    lake.drop_branch("etl")
    lake.drop_table("lab.base")  # all refs gone: drop proceeds
    with pytest.raises(CatalogError, match="does not exist"):
        lake.read("lab.base")


def test_merge_published_drop_refused_while_other_ref_pins(spark, tmp_path):
    """A branch DROP publishing at merge is the same physical rmtree —
    the merge must abort whole while another ref/tag still pins the
    table, and go through once that ref is gone."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.drop_table_on_branch("lab.base", "etl")
    lake.create_tag("train")  # pins lab.base on main
    with pytest.raises(CommitConflictError, match="pinned by catalog ref"):
        lake.merge_catalog_branch("etl")
    # nothing published: still visible on main AND on the tag
    assert _rows(lake, "lab.base") == {(1, "m1")}
    assert _rows(lake, "lab.base", ref="train") == {(1, "m1")}
    lake.drop_tag("train")
    res = lake.merge_catalog_branch("etl")
    assert res["dropped_tables"] == 1
    with pytest.raises(CatalogError, match="does not exist"):
        lake.read("lab.base")


def test_sql_drop_table_respects_tag_pin(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    sql = LakehouseSQL(lake)
    sql.sql("CALL system.create_tag(name => 'rel')")
    with pytest.raises(SqlError, match="pinned by catalog ref"):
        sql.sql("DROP TABLE lab.base")
    sql.sql("CALL system.drop_tag(name => 'rel')")
    sql.sql("DROP TABLE lab.base")


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
