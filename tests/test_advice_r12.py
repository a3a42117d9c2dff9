"""Round-12 advice fixes (ADVICE.md r11): USE passthrough, SHOW TABLES
after a racing catalog-branch drop, and rebase target capture."""

from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    Lakehouse,
    LakehouseSQL,
    SqlError,
)


def _df(spark, *rows):
    return spark.createDataFrame(list(rows), "k bigint, v string")


def _lake(spark, tmp_path):
    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    t = lake.create_table("lab.t1", schema="k bigint, v string")
    t.append(_df(spark, (1, "m1")).coalesce(1))
    return lake


def test_plain_use_falls_through_to_spark(spark, tmp_path):
    """`USE <database>` is Spark's own session-catalog switch — the
    lakehouse router must not intercept it (only USE REFERENCE is ours).
    Before the fix every non-REFERENCE USE raised SqlError."""
    lake = _lake(spark, tmp_path)
    sql = LakehouseSQL(lake)
    sql.sql("USE default")  # must not raise
    assert spark.catalog.currentDatabase() == "default"
    # malformed USE REFERENCE still errors in our router
    with pytest.raises(SqlError, match="unsupported USE syntax"):
        sql.sql("USE REFERENCE bad name")


def test_show_tables_after_ref_dropped_raises_sqlerror(spark, tmp_path):
    """Another process dropping the catalog branch after USE REFERENCE
    must surface as SqlError (the read/write error discipline), not a
    bare KeyError from the pins lookup."""
    lake = _lake(spark, tmp_path)
    lake.create_branch("etl")
    sql = LakehouseSQL(lake)
    sql.sql("USE REFERENCE etl")
    lake.drop_branch("etl")  # simulates the racing process
    with pytest.raises(SqlError, match="no longer exists"):
        sql.sql("SHOW TABLES IN lab")


def test_rebase_uses_one_target_per_table(spark, tmp_path, monkeypatch):
    """rebase() must validate and mutate against the SAME captured main
    head per table: a main commit landing between the validation pass
    and rebase_branch's own head read must not change the base the
    member actually rebases onto (pin == branch base afterwards)."""
    from local_datalakehouse_phase2_spark.lakehouse import maintenance as M

    lake = _lake(spark, tmp_path)
    t1 = lake.table("lab.t1")
    t1.append(_df(spark, (2, "m2")))
    lake.create_branch("etl")
    lake.append("lab.t1", _df(spark, (3, "e3")), catalog_ref="etl")
    target_before = t1.log.latest_main_version()

    real = M.rebase_branch
    calls = {}

    def spy(table, name, onto=None, drop_conflicting=False, **kw):
        calls[table.identifier] = onto
        # a main commit races in AFTER validation captured the target;
        # with onto pinned, rebase_branch must NOT re-read the head
        table.append(_df(spark, (4, "m4")))
        return real(table, name, onto=onto, drop_conflicting=drop_conflicting, **kw)

    monkeypatch.setattr(M, "rebase_branch", spy)
    # catalog_refs imports rebase_branch inside run(), so patching the
    # module attribute is enough
    out = lake.rebase_catalog_branch("etl")
    assert calls["lab.t1"] == target_before  # explicit target passed
    rec = lake.catalog_branches()["etl"]
    base, _head, _chain = t1.log.branch_info("catalog.etl")
    assert rec["pins"]["lab.t1"] == base == target_before
    assert out["rebased_tables"] == 1
