"""Plan gates for the rename name-mapping layer: the no-rename fast
path must stay a single plain parquet scan (zero overhead for the 99%
case), and a renamed table's read must collapse back to one scan once
compaction migrates every file to current names."""

from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.lakehouse import Lakehouse, rewrite_data_files


@pytest.fixture()
def lake(spark, tmp_path):
    lk = Lakehouse(spark, str(tmp_path / "warehouse"))
    lk.create_namespace("lab")
    return lk


def _scan_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Scan parquet")


def test_no_rename_read_is_single_scan(spark, lake):
    t = lake.create_table("lab.plain", schema="k bigint, v string")
    t.append(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    t.append(spark.createDataFrame([(2, "b")], "k bigint, v string"))
    df = t.read()
    assert _scan_count(df) == 1, "rename-free read must not split the scan"
    assert "Union" not in df._jdf.queryExecution().executedPlan().toString()


def test_renamed_read_unions_then_collapses_after_compaction(spark, lake):
    t = lake.create_table("lab.rn", schema="k bigint, v string")
    t.append(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    t.rename_column("v", "w")
    t.append(spark.createDataFrame([(2, "b")], "k bigint, w string"))
    # two epochs -> two scan groups (the price of the mapping)
    assert _scan_count(t.read()) == 2
    rewrite_data_files(t, target_file_size_bytes=1 << 30, min_input_files=1)
    # every live file now carries current names -> single scan again
    assert _scan_count(t.read()) == 1
    assert {tuple(r) for r in t.read().collect()} == {(1, "a"), (2, "b")}
