"""Scan-planning file pruning from logged column stats
(lakehouse/pruning.py + fs.stats_from_footer).

The contract under test is Iceberg's manifest-pruning contract:
(1) every commit records per-file min/max/null-count footer metrics,
(2) a filtered read drops files those metrics prove irrelevant —
    before any Spark job,
(3) results are EXACTLY the unpruned filter's results (pruning is
    advisory; the residual predicate always applies), and
(4) anything the stats can't decide — missing stats, type mismatch,
    unsupported shapes — degrades to scanning, never to wrong rows.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import Lakehouse, rewrite_data_files
from local_datalakehouse_phase2_spark.lakehouse.log import FileInfo
from local_datalakehouse_phase2_spark.lakehouse.pruning import (
    file_may_match,
    prune_files,
    residual_expr,
)


@pytest.fixture()
def lake(spark, tmp_path) -> Lakehouse:
    lk = Lakehouse(spark, str(tmp_path / "wh"))
    lk.create_namespace("lab")
    return lk


def _fi(stats, rows=100) -> FileInfo:
    return FileInfo(path="f.parquet", size_bytes=1, row_count=rows, stats=stats)


# ---- pure planning logic (no Spark) ---------------------------------


def test_each_operator_prunes_and_keeps():
    fi = _fi({"k": [10, 20, 0]})
    keep, drop = [], []
    cases = [
        (("k", "=", 15), True), (("k", "=", 9), False), (("k", "=", 21), False),
        (("k", "=", 10), True), (("k", "=", 20), True),
        (("k", "!=", 15), True), (("k", "<", 10), False), (("k", "<", 11), True),
        (("k", "<=", 9), False), (("k", "<=", 10), True),
        (("k", ">", 20), False), (("k", ">", 19), True),
        (("k", ">=", 21), False), (("k", ">=", 20), True),
        (("k", "in", [1, 2, 15]), True), (("k", "in", [1, 2]), False),
        (("k", "in", []), False),
    ]
    for flt, expect in cases:
        assert file_may_match(fi, [flt]) is expect, flt
    # != prunes only a constant file
    assert file_may_match(_fi({"k": [7, 7, 0]}), [("k", "!=", 7)]) is False
    assert file_may_match(_fi({"k": [7, 8, 0]}), [("k", "!=", 7)]) is True


def test_null_operators_use_null_counts():
    some_null = _fi({"k": [1, 5, 3]}, rows=10)
    no_null = _fi({"k": [1, 5, 0]}, rows=10)
    all_null = _fi({"k": [None, None, 10]}, rows=10)
    assert file_may_match(some_null, [("k", "is_null", None)])
    assert not file_may_match(no_null, [("k", "is_null", None)])
    assert file_may_match(all_null, [("k", "is_null", None)])
    assert file_may_match(some_null, [("k", "not_null", None)])
    assert not file_may_match(all_null, [("k", "not_null", None)])
    # comparisons never match an all-null column
    assert not file_may_match(all_null, [("k", "=", 1)])
    assert not file_may_match(all_null, [("k", "<", 100)])


def test_unknowns_always_scan():
    # no stats at all (pre-tracking commit)
    assert file_may_match(_fi(None), [("k", "=", 1)])
    # stats exist but not for this column
    assert file_may_match(_fi({"other": [0, 1, 0]}), [("k", "=", 1)])
    # type-mismatched literal
    assert file_may_match(_fi({"k": [10, 20, 0]}), [("k", "=", "abc")])
    assert file_may_match(_fi({"s": ["a", "z", 0]}), [("s", ">", 42)])
    # date literal against timestamp-shaped string bounds: formats
    # differ => must scan (Spark casts; lexicographic would mis-prune)
    ts_stats = _fi({"t": ["1995-03-05 12:00:00.000000", "1995-03-09 12:00:00.000000", 0]})
    assert file_may_match(ts_stats, [("t", "<", dt.date(1995, 3, 5))])
    # same-format datetime literal does prune
    assert not file_may_match(ts_stats, [("t", "<", dt.datetime(1995, 3, 5, 0, 0, 0))])


def test_conjunction_and_validation():
    fi = _fi({"a": [0, 10, 0], "b": [100, 200, 0]})
    assert file_may_match(fi, [("a", ">=", 5), ("b", "<=", 150)])
    assert not file_may_match(fi, [("a", ">=", 5), ("b", ">", 200)])
    with pytest.raises(ValueError, match="unsupported filter op"):
        prune_files({"f": fi}, [("a", "like", "x%")])
    with pytest.raises(ValueError, match="collection"):
        prune_files({"f": fi}, [("a", "in", 5)])
    kept, pruned = prune_files({"f": fi}, [("a", ">", 99)])
    assert kept == {} and pruned == 1


# ---- stats collection at write time ---------------------------------


def test_append_records_footer_stats(spark, lake):
    t = lake.create_table("lab.s", schema="k bigint, s string, x double, n int")
    t.append(
        spark.range(0, 100)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("doc"), F.format_string("%03d", F.col("id"))).alias("s"),
            (F.col("id") * 0.5).alias("x"),
            F.when(F.col("id") < 40, F.col("id").cast("int")).alias("n"),
        )
        .coalesce(1)
    )
    (fi,) = t.log.state_at().values()
    assert fi.stats["k"] == [0, 99, 0]
    assert fi.stats["s"] == ["doc000", "doc099", 0]
    assert fi.stats["x"] == [0.0, 49.5, 0]
    # n: values 0..39 plus 60 nulls
    assert fi.stats["n"] == [0, 39, 60]


def test_long_strings_drop_stats_not_correctness(spark, lake):
    t = lake.create_table("lab.longs", schema="k bigint, txt string")
    t.append(
        spark.range(0, 10)
        .select(F.col("id").alias("k"), F.concat(F.lit("x" * 500), F.col("id")).alias("txt"))
        .coalesce(1)
    )
    (fi,) = t.log.state_at().values()
    assert "txt" not in fi.stats and "k" in fi.stats
    # filtering on the statless column still works (full scan + residual)
    assert t.read(filters=[("txt", ">", "x")]).count() == 10


# ---- end-to-end pruned reads ----------------------------------------


def test_pruned_read_equals_full_filter_and_skips_files(spark, lake):
    t = lake.create_table("lab.p", properties={"write.target-file-size-bytes": "4096"}, schema="k bigint, v string")
    for off in (0, 1, 2):
        t.append(
            spark.range(0, 3000, 3).select(
                (F.col("id") + off).alias("k"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
        )
    # pre-compaction: interleaved appends => every file spans the whole
    # range, nothing prunable; results still exact
    flt = [("k", ">=", 100), ("k", "<", 200)]
    assert t.read(filters=flt).count() == 100
    res = rewrite_data_files(t, target_file_size_bytes=8192, strategy="sort", sort_order="k")
    assert res["added_files"] >= 3
    plan = t.scan_plan(flt)
    assert plan["files_scanned"] < plan["files_total"]
    assert plan["rows_scanned_max"] < plan["rows_total"]
    pruned = t.read(filters=flt)
    expect = t.read().filter((F.col("k") >= 100) & (F.col("k") < 200))
    assert pruned.count() == expect.count() == 100
    assert len(pruned.inputFiles()) == plan["files_scanned"] < len(t.read().inputFiles())
    # fully-out-of-range filter: zero files, empty frame, right schema
    plan0 = t.scan_plan([("k", ">", 10**9)])
    assert plan0["files_scanned"] == 0
    empty = t.read(filters=[("k", ">", 10**9)])
    assert empty.count() == 0 and empty.columns == ["k", "v"]


def test_stats_survive_checkpoint_and_rewrites(spark, lake):
    from local_datalakehouse_phase2_spark.lakehouse import rewrite_manifests

    t = lake.create_table("lab.ck", schema="k bigint, v string")
    t.append(
        spark.range(0, 50).select(
            F.col("k").alias("k") if False else F.col("id").alias("k"),
            F.lit("a").alias("v"),
        ).coalesce(1)
    )
    t.delete_where(F.col("k") >= 40)  # COW rewrite must re-record stats
    state = t.log.state_at()
    assert all(fi.stats and fi.stats["k"][1] <= 39 for fi in state.values())
    rewrite_manifests(t)  # checkpoint, then reload from a fresh handle
    t2 = Lakehouse(spark, lake.warehouse_dir).table("lab.ck")
    assert {p: fi.stats for p, fi in t2.log.state_at().items()} == {
        p: fi.stats for p, fi in state.items()
    }
    plan = t2.scan_plan([("k", ">=", 45)])
    assert plan["files_scanned"] == 0


def test_residual_expr_matches_spark_semantics(spark):
    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 4 == 0, F.col("id")).alias("n"),
    )
    got = df.filter(
        residual_expr([("k", ">=", 5), ("k", "<", 15), ("n", "not_null", None)])
    ).count()
    want = df.filter("k >= 5 and k < 15 and n is not null").count()
    assert got == want == 2  # ids 8 and 12


def test_pruning_edge_cases_never_misprune():
    """Unit checks on _chunk_may_match: NaN literals, plain-string
    timestamp literals vs micro-precision stats, and zoned datetime
    literals must all SCAN (True), never prune a matching file."""
    import datetime as dt

    from local_datalakehouse_phase2_spark.lakehouse.pruning import _chunk_may_match

    # NaN: Spark orders NaN above everything; Python comparisons with
    # NaN are all False — must scan, not prune
    assert _chunk_may_match("<", float("nan"), 1.0, 10.0, 0, 5) is True
    assert _chunk_may_match("in", [1.0, float("nan")], 1.0, 10.0, 0, 5) is True

    # plain-string ts literal vs microsecond-ISO stats: lengths differ,
    # lexicographic compare is not Spark's cast-compare — scan
    lo = hi = "2024-01-01 10:00:00.000000"
    assert _chunk_may_match("=", "2024-01-01 10:00:00", lo, hi, 0, 5) is True

    # zoned literal, same instant as UTC stats rendered +00:00
    lo = hi = "2024-01-01 10:00:00.000000+00:00"
    z = dt.datetime(2024, 1, 1, 15, 0, tzinfo=dt.timezone(dt.timedelta(hours=5)))
    assert _chunk_may_match("=", z, lo, hi, 0, 5) is True

    # sanity: honest prunes still prune
    assert _chunk_may_match("=", 99, 1, 10, 0, 5) is False
    assert _chunk_may_match("=", "b", "c", "f", 0, 5) is False
