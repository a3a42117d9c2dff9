"""As-of join semantics: tie handling, no-match drop, heavy-key shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_backward_match(spark):
    left = _mk(spark, [(1, 100, "p1"), (1, 200, "p2")], "k INT, t INT, lid STRING")
    right = _mk(spark, [(1, 50, "r1"), (1, 150, "r2"), (1, 300, "r3")], "k INT, t INT, rid STRING")
    out = asof_join(left, right, on="k", order="t", right_cols=("rid", "t"), tiebreak="rid")
    got = {r.lid: (r.r_rid, r.r_t) for r in out.collect()}
    assert got == {"p1": ("r1", 50), "p2": ("r2", 150)}


def test_asof_equal_timestamp_matches_inclusive(spark):
    left = _mk(spark, [(1, 100, "p1")], "k INT, t INT, lid STRING")
    right = _mk(spark, [(1, 100, "r1")], "k INT, t INT, rid STRING")
    out = asof_join(left, right, on="k", order="t", right_cols=("rid",), tiebreak="rid")
    assert [r.r_rid for r in out.collect()] == ["r1"]


def test_asof_tie_takes_largest_tiebreak(spark):
    left = _mk(spark, [(1, 100, "p1")], "k INT, t INT, lid STRING")
    right = _mk(
        spark, [(1, 90, "a"), (1, 90, "b"), (1, 90, "c")], "k INT, t INT, rid STRING"
    )
    out = asof_join(left, right, on="k", order="t", right_cols=("rid",), tiebreak="rid")
    assert [r.r_rid for r in out.collect()] == ["c"]


def test_asof_no_prior_right_row_dropped(spark):
    left = _mk(spark, [(1, 100, "early"), (2, 100, "other_key")], "k INT, t INT, lid STRING")
    right = _mk(spark, [(1, 200, "late")], "k INT, t INT, rid STRING")
    out = asof_join(left, right, on="k", order="t", right_cols=("rid",), tiebreak="rid")
    assert out.count() == 0


def test_asof_keys_do_not_cross(spark):
    left = _mk(spark, [(1, 100, "p1"), (2, 100, "p2")], "k INT, t INT, lid STRING")
    right = _mk(spark, [(1, 50, "r1"), (2, 60, "r2")], "k INT, t INT, rid STRING")
    out = asof_join(left, right, on="k", order="t", right_cols=("rid",), tiebreak="rid")
    got = {r.lid: r.r_rid for r in out.collect()}
    assert got == {"p1": "r1", "p2": "r2"}


def test_asof_plan_has_single_shuffle_no_join(spark):
    """The union+window formulation must not plan a join, and must
    shuffle exactly once (on the key) — that's the whole point."""
    left = _mk(spark, [(1, 100, "p1")], "k INT, t INT, lid STRING")
    right = _mk(spark, [(1, 50, "r1")], "k INT, t INT, rid STRING")
    out = asof_join(left, right, on="k", order="t", right_cols=("rid",), tiebreak="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
