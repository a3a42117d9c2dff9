"""Property tests for partition transforms (lakehouse/partition.py):
the plan-side arithmetic (literal_value / may_match) must agree with
the write-side Spark expressions, and pruning must be one-sided —
a file that holds a matching row may NEVER be pruned. Mis-agreement
here is silent wrong results, so this is the most safety-critical
surface in the repo.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse.partition import (
    Transform,
    parse_spec,
)

TRANSFORMS = [
    Transform("identity", "s"),
    Transform("identity", "i"),
    Transform("year", "ts"),
    Transform("month", "ts"),
    Transform("day", "ts"),
    Transform("hour", "ts"),
    Transform("bucket", "i", 16),
    Transform("bucket", "s", 7),
    Transform("truncate", "i", 100),
    Transform("truncate", "s", 3),
]

_INTS = st.integers(min_value=-(2**40), max_value=2**40)
_STRS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    min_size=0,
    max_size=12,
)
_TS = st.datetimes(
    min_value=dt.datetime(1975, 1, 3, 1, 2, 3),
    max_value=dt.datetime(2099, 12, 28, 22, 57, 58),
)


def _spark_transform_values(spark, tr: Transform, values: list):
    """Write-side partition value for each input, via the SAME Spark
    expression the writer uses (cast to string — the dir rendering)."""
    if tr.source == "i":
        df = spark.createDataFrame([(v,) for v in values], "i bigint")
    elif tr.source == "s":
        df = spark.createDataFrame([(v,) for v in values], "s string")
    else:
        df = spark.createDataFrame([(v,) for v in values], "ts timestamp")
    rows = df.select(tr.expr(df).cast("string").alias("p")).collect()
    return [r.p for r in rows]


@pytest.mark.parametrize("tr", TRANSFORMS, ids=lambda t: f"{t.kind}-{t.source}{t.param or ''}")
def test_literal_value_matches_spark_expr(spark, tr):
    """literal_value (the planner's Python replica of the transform)
    must equal the Spark expression's rendering for every value it
    claims to compute — a drift here mis-prunes silently."""
    if tr.source == "i":
        values = [0, 1, -1, 7, -7, 99, -100, 101, 2**40, -(2**40), 63, 64, 65]
    elif tr.source == "s":
        values = ["", "a", "ab", "abc", "abcd", "né e", "ZZ9", "=", "%41", "日本語テスト"]
    else:
        values = [
            dt.datetime(2024, 3, 1),
            dt.datetime(2024, 3, 1, 13, 5, 7),
            dt.datetime(1999, 12, 31, 23, 59, 59),
            dt.datetime(1975, 1, 6, 1, 0, 0),
        ]
    got = _spark_transform_values(spark, tr, values)
    for v, spark_val in zip(values, got):
        planned = tr.literal_value(v)
        if planned is not None:
            assert planned == spark_val, f"{tr}: {v!r} -> {planned!r} != {spark_val!r}"


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(v=_INTS, lit=_INTS, op=st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
def test_may_match_sound_for_int_transforms(v, lit, op):
    """One-sided soundness, pure-Python side: if the ROW satisfies
    `source op lit`, the file holding it must never be pruned."""
    import operator as _op

    ops = {"=": _op.eq, "!=": _op.ne, "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}
    for tr in (
        Transform("identity", "i"),
        Transform("bucket", "i", 16),
        Transform("truncate", "i", 100),
    ):
        pvalue = tr.literal_value(v)
        assert pvalue is not None
        if ops[op](v, lit):
            assert tr.may_match(op, lit, pvalue), (tr, v, lit, op, pvalue)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(v=_STRS, lit=_STRS, op=st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
def test_may_match_sound_for_string_transforms(v, lit, op):
    import operator as _op

    ops = {"=": _op.eq, "!=": _op.ne, "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}
    for tr in (
        Transform("identity", "s"),
        Transform("bucket", "s", 7),
        Transform("truncate", "s", 3),
    ):
        pvalue = tr.literal_value(v)
        if pvalue is None:
            continue
        if ops[op](v, lit):
            assert tr.may_match(op, lit, pvalue), (tr, v, lit, op, pvalue)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    v=_TS,
    lit=_TS,
    op=st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
    kind=st.sampled_from(["year", "month", "day", "hour"]),
)
def test_may_match_sound_for_time_transforms(v, lit, op, kind):
    import operator as _op

    ops = {"=": _op.eq, "!=": _op.ne, "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}
    tr = Transform(kind, "ts")
    pvalue = tr.literal_value(v)
    assert pvalue is not None
    if ops[op](v, lit):
        assert tr.may_match(op, lit, pvalue), (tr, v, lit, op, pvalue)


@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(_INTS, min_size=1, max_size=5),
    v=_INTS,
)
def test_may_match_sound_for_in_lists(vals, v):
    for tr in (
        Transform("identity", "i"),
        Transform("bucket", "i", 16),
        Transform("truncate", "i", 100),
    ):
        pvalue = tr.literal_value(v)
        if v in vals:
            assert tr.may_match("in", vals, pvalue), (tr, v, vals, pvalue)


def test_parse_render_roundtrip():
    from local_datalakehouse_phase2_spark.lakehouse.partition import render_transform

    spec = "cat, year(ts), month(ts), day(ts), hour(ts), bucket(16, id), truncate(10, name)"
    parsed = parse_spec(spec)
    rendered = ", ".join(render_transform(t) for t in parsed)
    assert parse_spec(rendered) == parsed
