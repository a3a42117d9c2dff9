"""Catalog-persisted SQL views (the Nessie view-catalog analog):
CREATE [OR REPLACE] VIEW / DROP VIEW / SHOW VIEWS, reference-time
expansion (views see CURRENT table state), view-on-view nesting, and
cycle protection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import (
    CatalogError,
    Lakehouse,
    LakehouseSQL,
)
from local_datalakehouse_phase2_spark.lakehouse.sql import SqlError


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def sql(lake):
    return LakehouseSQL(lake)


def _seed(spark, lake):
    lake.create_namespace("lab")
    t = lake.create_table("lab.base", schema="k bigint, v string")
    t.append(
        spark.range(0, 10).select(
            F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
    )
    return t


def test_view_lifecycle_and_current_state(spark, lake, sql):
    t = _seed(spark, lake)
    sql.sql("CREATE VIEW lab.evens AS SELECT k, v FROM lab.base WHERE k % 2 = 0")
    assert sql.sql("SELECT COUNT(*) AS n FROM lab.evens").first().n == 5
    # views expand at reference time: new data is visible immediately
    t.append(spark.createDataFrame([(20, "x"), (21, "y")], "k bigint, v string"))
    assert sql.sql("SELECT COUNT(*) AS n FROM lab.evens").first().n == 6
    rows = sql.sql("SHOW VIEWS IN lab").collect()
    assert [(r.namespace, r.viewName) for r in rows] == [("lab", "evens")]
    with pytest.raises(SqlError, match="already exists"):
        sql.sql("CREATE VIEW lab.evens AS SELECT * FROM lab.base")
    sql.sql("CREATE OR REPLACE VIEW lab.evens AS SELECT k FROM lab.base WHERE k > 8")
    assert sql.sql("SELECT COUNT(*) AS n FROM lab.evens").first().n == 3
    sql.sql("DROP VIEW lab.evens")
    assert sql.sql("SHOW VIEWS IN lab").count() == 0
    with pytest.raises(CatalogError):
        sql.sql("DROP VIEW lab.evens")
    assert sql.sql("DROP VIEW IF EXISTS lab.evens").first().dropped is False


def test_view_on_view_and_joins(spark, lake, sql):
    _seed(spark, lake)
    sql.sql("CREATE VIEW lab.v1 AS SELECT k, v FROM lab.base WHERE k < 8")
    sql.sql("CREATE VIEW lab.v2 AS SELECT k FROM lab.v1 WHERE k >= 4")
    assert sql.sql("SELECT COUNT(*) AS n FROM lab.v2").first().n == 4
    got = sql.sql(
        "SELECT COUNT(*) AS n FROM lab.v2 a JOIN lab.base b ON a.k = b.k"
    ).first()
    assert got.n == 4


def test_view_cycle_detected(spark, lake, sql):
    _seed(spark, lake)
    sql.sql("CREATE VIEW lab.c1 AS SELECT k FROM lab.base")
    # rewrite the stored definition into a cycle (c1 -> c2 -> c1)
    lake.create_view("lab.c2", "SELECT k FROM lab.c1", replace=True)
    lake.create_view("lab.c1", "SELECT k FROM lab.c2", replace=True)
    with pytest.raises(SqlError, match="too deep"):
        sql.sql("SELECT * FROM lab.c1")


def test_invalid_view_definition_rejected(spark, lake, sql):
    _seed(spark, lake)
    with pytest.raises(Exception):
        sql.sql("CREATE VIEW lab.bad AS SELECT nope FROM lab.base")
    assert lake.views("lab") == []  # nothing persisted


def test_view_table_name_collision_rejected(spark, lake, sql):
    """Tables and views share one identifier namespace (Nessie catalog
    uniqueness): the SQL router expands views BEFORE tables, so a
    same-named view would silently shadow the table in every statement."""
    _seed(spark, lake)
    with pytest.raises(CatalogError, match="a table named"):
        lake.create_view("lab.base", "SELECT 1 AS k")
    with pytest.raises(SqlError, match="a table named"):
        sql.sql("CREATE VIEW lab.base AS SELECT k FROM lab.base")
    lake.create_view("lab.v_only", "SELECT 1 AS k")
    with pytest.raises(CatalogError, match="a view named"):
        lake.create_table("lab.v_only", schema="k bigint")


def test_failed_create_table_does_not_squat_view_name(spark, lake, sql):
    """ADVICE r7: create_table constructs the table (its log __init__
    makedirs metadata/) BEFORE spec validation can raise — the phantom
    empty metadata dir must not permanently block a same-named view."""
    _seed(spark, lake)
    with pytest.raises(CatalogError):
        lake.create_table(
            "lab.ghost",
            schema="k bigint",
            partition_by="days(k)",  # invalid: days() needs date/timestamp
        )
    lake.create_view("lab.ghost", "SELECT 1 AS k")  # must not be blocked
    assert sql.sql("SELECT * FROM lab.ghost").collect()[0].k == 1
    # and a REAL committed table still blocks a same-named view
    with pytest.raises(CatalogError, match="a table named"):
        lake.create_view("lab.base", "SELECT 1 AS k")
