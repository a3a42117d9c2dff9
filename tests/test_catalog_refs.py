"""Catalog-wide refs (catalog_refs.py) — the Nessie model: one branch
spans the whole warehouse, accumulates commits across many tables, and
publishes atomically with one merge (the reference stack pins
`spark.sql.catalog.nessie.ref=main` catalog-wide,
/root/reference/spark/conf/spark-defaults.conf:9)."""

from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    CatalogRefError,
    CommitConflictError,
    Lakehouse,
    LakehouseSQL,
    SqlError,
)


def _df(spark, *rows):
    return spark.createDataFrame(list(rows), "k bigint, v string")


def _rows(lake, ident, catalog_ref=None):
    return {tuple(r) for r in lake.read(ident, catalog_ref=catalog_ref).collect()}


def _lake(spark, tmp_path, name="w"):
    lake = Lakehouse(spark, str(tmp_path / name))
    lake.create_namespace("lab")
    for ident in ("lab.t1", "lab.t2"):
        t = lake.create_table(ident, schema="k bigint, v string")
        t.append(_df(spark, (1, "m1")).coalesce(1))
    return lake


def test_fork_pins_and_isolation(spark, tmp_path):
    """Nessie fork semantics: main commits AFTER the fork are invisible
    on the branch, for touched and untouched tables alike; a table
    created after the fork does not exist on the branch."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    # main moves after the fork on BOTH tables
    lake.table("lab.t1").append(_df(spark, (9, "m9")))
    lake.table("lab.t2").append(_df(spark, (9, "m9")))
    # untouched table: fork pin, not current main
    assert _rows(lake, "lab.t2", "etl") == {(1, "m1")}
    # touched table: pin + branch writes, never main's post-fork commit
    lake.append("lab.t1", _df(spark, (2, "e2")), catalog_ref="etl")
    assert _rows(lake, "lab.t1", "etl") == {(1, "m1"), (2, "e2")}
    assert _rows(lake, "lab.t1") == {(1, "m1"), (9, "m9")}
    # a table created on main after the fork is absent on the branch
    lake.create_table("lab.post", schema="k bigint, v string").append(
        _df(spark, (1, "x"))
    )
    with pytest.raises(CatalogRefError, match="does not exist on catalog ref"):
        lake.read("lab.post", catalog_ref="etl")
    with pytest.raises(CatalogRefError, match="does not exist on catalog ref"):
        lake.append("lab.post", _df(spark, (2, "y")), catalog_ref="etl")


def test_branch_vs_branch_isolation(spark, tmp_path):
    """Two catalog branches writing the SAME table never see each
    other, and merging one publishes only its own chain."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("a")
    lake.create_branch("b")
    lake.append("lab.t1", _df(spark, (10, "a10")), catalog_ref="a")
    lake.append("lab.t1", _df(spark, (20, "b20")), catalog_ref="b")
    assert _rows(lake, "lab.t1", "a") == {(1, "m1"), (10, "a10")}
    assert _rows(lake, "lab.t1", "b") == {(1, "m1"), (20, "b20")}
    assert _rows(lake, "lab.t1") == {(1, "m1")}
    res = lake.merge_catalog_branch("a")
    assert res["merged_tables"] == 1
    assert _rows(lake, "lab.t1") == {(1, "m1"), (10, "a10")}
    # b still isolated: sees its fork pin + own write, not a's merge
    assert _rows(lake, "lab.t1", "b") == {(1, "m1"), (20, "b20")}


def test_merge_publishes_all_tables_atomically(spark, tmp_path):
    """The headline flow: two tables, >=2 commits each on the branch,
    main unchanged until ONE merge publishes both; merge is
    exactly-once (second call is a no-op) and the branch continues
    from the new anchor."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    for i in (2, 3):
        lake.append("lab.t1", _df(spark, (i, f"e{i}")), catalog_ref="etl")
        lake.append("lab.t2", _df(spark, (i, f"e{i}")), catalog_ref="etl")
    assert _rows(lake, "lab.t1") == {(1, "m1")}
    assert _rows(lake, "lab.t2") == {(1, "m1")}
    res = lake.merge_catalog_branch("etl")
    assert res["merged_tables"] == 2 and res["merged_commits"] == 4
    post = {(1, "m1"), (2, "e2"), (3, "e3")}
    assert _rows(lake, "lab.t1") == post
    assert _rows(lake, "lab.t2") == post
    assert lake.merge_catalog_branch("etl")["merged_tables"] == 0
    # the branch keeps working from the merge anchor
    lake.append("lab.t1", _df(spark, (4, "e4")), catalog_ref="etl")
    assert _rows(lake, "lab.t1", "etl") == post | {(4, "e4")}
    assert _rows(lake, "lab.t1") == post
    assert lake.merge_catalog_branch("etl")["merged_tables"] == 1
    assert _rows(lake, "lab.t1") == post | {(4, "e4")}


def test_merge_conflict_aborts_every_table(spark, tmp_path):
    """All-or-nothing under conflict: the branch overwrites t1 (claims
    its files) and appends to t2; a main overwrite of t1 races in
    first. The catalog merge must reject — and t2's clean chain must
    NOT publish (atomicity), staying intact on the branch."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.overwrite("lab.t1", _df(spark, (5, "e5")), catalog_ref="etl")
    lake.append("lab.t2", _df(spark, (6, "e6")), catalog_ref="etl")
    lake.table("lab.t1").overwrite(_df(spark, (7, "m7")))  # main wins the race
    with pytest.raises(CommitConflictError, match="catalog merge aborts"):
        lake.merge_catalog_branch("etl")
    assert _rows(lake, "lab.t1") == {(7, "m7")}
    assert _rows(lake, "lab.t2") == {(1, "m1")}  # t2 did NOT publish
    # the branch chains survive the aborted merge
    assert _rows(lake, "lab.t2", "etl") == {(1, "m1"), (6, "e6")}


def test_row_level_ops_on_catalog_ref(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.table("lab.t1").append(_df(spark, (2, "m2"), (3, "m3")))
    lake.create_branch("etl")
    lake.delete_where("lab.t1", "k = 2", catalog_ref="etl")
    lake.update_where("lab.t1", {"v": "'patched'"}, "k = 3", catalog_ref="etl")
    assert _rows(lake, "lab.t1", "etl") == {(1, "m1"), (3, "patched")}
    assert _rows(lake, "lab.t1") == {(1, "m1"), (2, "m2"), (3, "m3")}
    lake.merge_catalog_branch("etl")
    assert _rows(lake, "lab.t1") == {(1, "m1"), (3, "patched")}


def test_drop_branch_removes_per_table_refs(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.append("lab.t1", _df(spark, (2, "e2")), catalog_ref="etl")
    assert "catalog.etl" in lake.table("lab.t1").log.refs()
    lake.drop_branch("etl")
    assert "etl" not in lake.catalog_branches()
    assert "catalog.etl" not in lake.table("lab.t1").log.refs()
    assert _rows(lake, "lab.t1") == {(1, "m1")}  # abandoned, never published
    with pytest.raises(CatalogRefError, match="does not exist"):
        lake.read("lab.t1", catalog_ref="etl")


def test_duplicate_and_invalid_names(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    with pytest.raises(CatalogRefError, match="already exists"):
        lake.create_branch("etl")
    with pytest.raises(CatalogRefError, match="invalid catalog ref name"):
        lake.create_branch("../escape")


def test_sql_use_reference_flow(spark, tmp_path):
    """The SQL spelling: CALL system.create_branch + USE REFERENCE
    routes reads and writes onto the branch; metadata statements and
    per-table procedures are refused on a ref; merge publishes."""
    lake = _lake(spark, tmp_path)
    sql = LakehouseSQL(lake)
    sql.sql("CALL system.create_branch(name => 'etl')")
    sql.sql("USE REFERENCE etl")
    sql.sql("INSERT INTO lab.t1 VALUES (2, 'e2')")
    sql.sql("UPDATE lab.t1 SET v = 'e2x' WHERE k = 2")
    sql.sql("DELETE FROM lab.t2 WHERE k = 1")
    got = {tuple(r) for r in sql.sql("SELECT * FROM lab.t1").collect()}
    assert got == {(1, "m1"), (2, "e2x")}
    assert sql.sql("SELECT * FROM lab.t2").count() == 0
    # CREATE/DROP TABLE route to catalog-branch DDL since r12
    # (tests/test_catalog_ddl_refs.py); the rest still refuse on a ref
    for stmt in (
        "ALTER TABLE lab.t1 ADD COLUMN z BIGINT",
        "TRUNCATE TABLE lab.t1",
        "CALL system.rewrite_data_files(table => 'lab.t1')",
    ):
        with pytest.raises(SqlError, match="not supported under USE REFERENCE"):
            sql.sql(stmt)
    sql.sql("USE REFERENCE main")
    assert {tuple(r) for r in sql.sql("SELECT * FROM lab.t1").collect()} == {(1, "m1")}
    res = sql.sql("CALL system.merge_catalog_branch(name => 'etl')").collect()[0]
    assert res.merged_tables == 2
    assert {tuple(r) for r in sql.sql("SELECT * FROM lab.t1").collect()} == {
        (1, "m1"),
        (2, "e2x"),
    }
    assert sql.sql("SELECT * FROM lab.t2").count() == 0
    with pytest.raises(SqlError, match="does not exist"):
        sql.sql("USE REFERENCE nope")


def test_sql_explicit_suffix_overrides_session_ref(spark, tmp_path):
    """Explicit per-table branch/time-travel spellings stay explicit
    under USE REFERENCE, like explicit VERSION AS OF does."""
    lake = _lake(spark, tmp_path)
    t = lake.table("lab.t1")
    t.create_branch("dev")
    t.append(_df(spark, (5, "dev5")), ref="dev")
    sql = LakehouseSQL(lake)
    sql.sql("CALL system.create_branch(name => 'etl')")
    sql.sql("USE REFERENCE etl")
    got = {tuple(r) for r in sql.sql("SELECT * FROM lab.t1.branch_dev").collect()}
    assert got == {(1, "m1"), (5, "dev5")}
    # explicit INSERT onto the per-table branch bypasses the session ref
    sql.sql("INSERT INTO lab.t1.branch_dev VALUES (6, 'dev6')")
    assert {tuple(r) for r in sql.sql("SELECT * FROM lab.t1.branch_dev").collect()} == {
        (1, "m1"),
        (5, "dev5"),
        (6, "dev6"),
    }
    assert {tuple(r) for r in sql.sql("SELECT * FROM lab.t1").collect()} == {(1, "m1")}


def test_expire_snapshots_preserves_catalog_branch(spark, tmp_path):
    """Maintenance during an active catalog branch must not eat it:
    expire_snapshots keeps the fork pin and the per-table branch chain
    (branch lineages pin their snapshots), so branch reads and the
    eventual merge survive aggressive retention."""
    from local_datalakehouse_phase2_spark.lakehouse import expire_snapshots

    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.append("lab.t1", _df(spark, (2, "e2")), catalog_ref="etl")
    # main churns enough that retain_last=1 would expire the fork pin
    # if branches didn't pin their lineage
    for i in range(3):
        lake.table("lab.t1").append(_df(spark, (90 + i, f"m{i}")))
    expire_snapshots(lake.table("lab.t1"), retain_last=1)
    assert _rows(lake, "lab.t1", "etl") == {(1, "m1"), (2, "e2")}
    lake.merge_catalog_branch("etl")
    assert (2, "e2") in _rows(lake, "lab.t1")


def test_branch_write_racing_merge_stays_on_branch(spark, tmp_path):
    """A branch commit that lands AFTER the merge captured its chain
    must survive on the branch (reanchor drops exactly the merged set),
    publishing only at the NEXT merge — never lost, never
    double-published."""
    from local_datalakehouse_phase2_spark.lakehouse import catalog_refs as cr

    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.append("lab.t1", _df(spark, (2, "e2")), catalog_ref="etl")

    # inject the racer at the last possible moment: after the merge
    # staged its entry (chain captured), before the marker decides
    orig = cr.CatalogRefs._revalidate
    fired = {"done": False}

    def revalidate_with_racer(self, t, entry):
        if not fired["done"]:
            fired["done"] = True
            self.lake._catalog_refs.append(
                "lab.t1", _df(spark, (3, "racer")), "etl"
            )
        return orig(self, t, entry)

    import unittest.mock as mock

    with mock.patch.object(cr.CatalogRefs, "_revalidate", revalidate_with_racer):
        res = lake.merge_catalog_branch("etl")
    assert res["merged_commits"] == 1  # only the captured chain
    assert _rows(lake, "lab.t1") == {(1, "m1"), (2, "e2")}  # racer unpublished
    assert _rows(lake, "lab.t1", "etl") == {(1, "m1"), (2, "e2"), (3, "racer")}
    res2 = lake.merge_catalog_branch("etl")
    assert res2["merged_commits"] == 1
    assert _rows(lake, "lab.t1") == {(1, "m1"), (2, "e2"), (3, "racer")}


def test_concurrent_catalog_merges_serialize(spark, tmp_path):
    """Two merge attempts on the same ref: the lock serializes them —
    the second sees empty chains and no-ops; content publishes exactly
    once. (Simulated in-process: the lock is the same O_EXCL file a
    second process would contend on; the two-process behavior of that
    primitive is proven in tests/test_flock_mutex.py.)"""
    import threading

    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.append("lab.t1", _df(spark, (2, "e2")), catalog_ref="etl")
    lake.append("lab.t2", _df(spark, (2, "e2")), catalog_ref="etl")
    results = []

    def go():
        results.append(lake.merge_catalog_branch("etl"))

    a, b = threading.Thread(target=go), threading.Thread(target=go)
    a.start(), b.start()
    a.join(60), b.join(60)
    assert len(results) == 2
    merged = sorted(r["merged_tables"] for r in results)
    assert merged == [0, 2], f"exactly one merge publishes: {merged}"
    post = {(1, "m1"), (2, "e2")}
    assert _rows(lake, "lab.t1") == post and _rows(lake, "lab.t2") == post


def test_sql_show_branches_and_ref_scoped_show_tables(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    sql = LakehouseSQL(lake)
    assert sql.sql("SHOW BRANCHES").count() == 0
    sql.sql("CALL system.create_branch(name => 'etl')")
    sql.sql("CREATE TABLE lab.post (k BIGINT, v STRING)")  # after the fork
    sql.sql("USE REFERENCE etl")
    rows = {tuple(r) for r in sql.sql("SHOW BRANCHES").collect()}
    assert rows == {("etl", 2, False, True)}
    # post-fork table invisible in ref-scoped SHOW TABLES
    tables = {r.tableName for r in sql.sql("SHOW TABLES IN lab").collect()}
    assert tables == {"t1", "t2"}
    sql.sql("USE REFERENCE main")
    tables = {r.tableName for r in sql.sql("SHOW TABLES IN lab").collect()}
    assert tables == {"t1", "t2", "post"}
    assert {tuple(r) for r in sql.sql("SHOW BRANCHES").collect()} == {
        ("etl", 2, False, False)
    }


def test_streaming_ingest_onto_catalog_ref(spark, tmp_path):
    """Micro-batch ingest commits onto the catalog branch: invisible
    on main, exactly-once under restart (batch-id watermark), and
    published by the catalog merge together with everything else."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    src_dir, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _df(spark, (50, "s50"), (51, "s51")).write.parquet(src_dir)
    schema = "k bigint, v string"

    def ingest():
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = lake._catalog_refs.stream_into(
            "lab.t1", stream, ckpt, "etl", query_name="catref-ingest"
        )
        q.awaitTermination(60)

    ingest()
    assert _rows(lake, "lab.t1", "etl") == {(1, "m1"), (50, "s50"), (51, "s51")}
    assert _rows(lake, "lab.t1") == {(1, "m1")}
    ingest()  # replay with the same checkpoint: exactly-once, no dupes
    assert _rows(lake, "lab.t1", "etl") == {(1, "m1"), (50, "s50"), (51, "s51")}
    lake.merge_catalog_branch("etl")
    assert _rows(lake, "lab.t1") == {(1, "m1"), (50, "s50"), (51, "s51")}


def test_rebase_refreshes_pins_and_recovers_conflicting_merge(spark, tmp_path):
    """The full conflict-recovery loop the per-table flow has
    (merge fails -> rebase -> re-apply -> merge succeeds), at catalog
    scope: rebase advances EVERY pin to current main (untouched tables
    included), drops exactly the conflicting commit when asked, keeps
    the clean table's chain, and the next merge publishes everything."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.overwrite("lab.t1", _df(spark, (5, "e5")), catalog_ref="etl")
    lake.append("lab.t2", _df(spark, (6, "e6")), catalog_ref="etl")
    lake.table("lab.t1").overwrite(_df(spark, (7, "m7")))  # main wins
    with pytest.raises(CommitConflictError):
        lake.merge_catalog_branch("etl")

    # default rebase: all-or-nothing refusal names the conflict,
    # and NOTHING moved — the clean table's branch view is unchanged
    with pytest.raises(CommitConflictError, match="nothing rebased"):
        lake.rebase_catalog_branch("etl")
    assert _rows(lake, "lab.t2", "etl") == {(1, "m1"), (6, "e6")}
    assert _rows(lake, "lab.t1", "etl") == {(5, "e5")}

    res = lake.rebase_catalog_branch("etl", drop_conflicting=True)
    assert list(res["dropped_commits"]) == ["lab.t1"]
    # pins refreshed: the branch now sees main's overwrite on t1...
    assert _rows(lake, "lab.t1", "etl") == {(7, "m7")}
    # ...and t2's clean chain survived the rebase
    assert _rows(lake, "lab.t2", "etl") == {(1, "m1"), (6, "e6")}
    # re-apply the dropped change on the rebased branch, then publish
    lake.overwrite("lab.t1", _df(spark, (5, "e5")), catalog_ref="etl")
    merged = lake.merge_catalog_branch("etl")
    assert merged["merged_tables"] == 2
    assert _rows(lake, "lab.t1") == {(5, "e5")}
    assert _rows(lake, "lab.t2") == {(1, "m1"), (6, "e6")}


def test_sql_rebase_catalog_branch(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    sql = LakehouseSQL(lake)
    sql.sql("CALL system.create_branch(name => 'etl')")
    sql.sql("USE REFERENCE etl")
    sql.sql("INSERT INTO lab.t2 VALUES (6, 'e6')")
    sql.sql("USE REFERENCE main")
    lake.table("lab.t1").append(_df(spark, (9, "m9")))  # main moves
    res = sql.sql(
        "CALL system.rebase_catalog_branch(name => 'etl')"
    ).collect()[0]
    assert res.rebased_tables >= 1 and res.dropped_commits == 0
    sql.sql("USE REFERENCE etl")
    # pin refreshed: main's move is now visible on the branch
    got = {tuple(r) for r in sql.sql("SELECT * FROM lab.t1").collect()}
    assert got == {(1, "m1"), (9, "m9")}
    got2 = {tuple(r) for r in sql.sql("SELECT * FROM lab.t2").collect()}
    assert got2 == {(1, "m1"), (6, "e6")}


def test_eq_delete_in_stage_to_marker_window_gates_merged_rows(spark, tmp_path):
    """Pin the documented sequence-semantics caveat (catalog_refs.py
    module docstring): merge entries re-stamp added-file seq at STAGE
    time while visibility arrives at the MARKER flip, so an equality
    delete committed on main inside that window has a higher seq than
    the merged rows and gates them once they publish — the same
    stage-time-seq stance transaction.py documents. (The per-table
    merge has no such window: its merge entry IS the visibility
    point.)"""
    from local_datalakehouse_phase2_spark.lakehouse import catalog_refs as cr

    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    lake.append("lab.t1", _df(spark, (2, "e2"), (3, "e3")), catalog_ref="etl")

    orig = cr.CatalogRefs._revalidate
    fired = {"done": False}

    def revalidate_with_eqdel(self, t, entry):
        if not fired["done"]:
            fired["done"] = True
            # main commits an equality delete for k=2 AFTER the merge
            # entry staged (seq V_m) and BEFORE the marker flips
            lake.table("lab.t1").equality_delete(
                spark.createDataFrame([(2,)], "k bigint"), ["k"]
            )
        return orig(self, t, entry)

    import unittest.mock as mock

    with mock.patch.object(cr.CatalogRefs, "_revalidate", revalidate_with_eqdel):
        res = lake.merge_catalog_branch("etl")
    assert res["merged_tables"] == 1
    # the delete (seq > merged rows' stage-time seq) gates k=2; k=3
    # publishes normally
    assert _rows(lake, "lab.t1") == {(1, "m1"), (3, "e3")}


def test_expire_snapshots_preserves_untouched_table_pin(spark, tmp_path):
    """The fork pin of a table the branch NEVER wrote lives only in
    the catalog record (no per-table ref exists yet — the branch is
    lazy), so expiry must read the warehouse's catalog-ref records:
    without that, retain_last=1 after main churn expired the pin out
    from under the branch (found by self-review in round 11; the
    touched-table case was already covered)."""
    from local_datalakehouse_phase2_spark.lakehouse import expire_snapshots

    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")  # pins lab.t1; the branch never writes it
    for i in range(3):
        lake.table("lab.t1").overwrite(_df(spark, (10 + i, "x")))
    expire_snapshots(lake.table("lab.t1"), retain_last=1)
    # the pin survived: the branch still reads the fork-point state
    assert _rows(lake, "lab.t1", "etl") == {(1, "m1")}
    # and a LATER first write still forks the per-table branch at it
    lake.append("lab.t1", _df(spark, (2, "e2")), catalog_ref="etl")
    assert _rows(lake, "lab.t1", "etl") == {(1, "m1"), (2, "e2")}
    # dropping the catalog branch releases the pin for future expiry
    lake.drop_branch("etl")
    expire_snapshots(lake.table("lab.t1"), retain_last=1)
    assert _rows(lake, "lab.t1") == {(12, "x")}


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
