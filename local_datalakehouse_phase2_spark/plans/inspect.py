"""Physical-plan inspection: make plan quality testable.

The optimizer work in this engine is Catalyst's (SURVEY.md §4) — our
job is to express queries so Catalyst's free optimizations actually
fire. These helpers turn `.explain("formatted")` into assertions so
regressions in pushdown / pruning / join strategy / partial
aggregation fail tests instead of silently burning a cluster:

- predicate pushdown:   PushedFilters on the parquet scan
- column pruning:       ReadSchema strictly narrower than the table
- broadcast joins:      BroadcastHashJoin for dim joins (no shuffle of
                        the big side)
- partial aggregation:  HashAggregate partial -> final (map-side
                        combine, shuffle carries group rows not input)
- top-k:                TakeOrderedAndProject (never global sort)
- whole-stage codegen:  hot expressions inside codegen spans
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain(mode) prints)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter lists pushed into each parquet scan, e.g. ['IsNotNull(x)', ...]."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of each file scan (pruned column sets)."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan_string(df))]


def scan_columns(df: DataFrame) -> list[set[str]]:
    """TOP-LEVEL column-name sets actually read by each parquet scan.
    Nested struct<...> payloads are blanked before field extraction so
    inner field names don't masquerade as scanned columns. NOTE: the
    explain renderer truncates ReadSchema at
    spark.sql.maxMetadataStringLength — session.py raises it so wide
    schemas don't silently under-report (an under-reported set would
    let a column-pruning assertion pass vacuously)."""
    cols = []
    for schema in read_schemas(df):
        body = schema[len("struct<"):]
        # blank nested angle-bracket payloads, keep top-level commas
        out, depth = [], 0
        for ch in body:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth = max(0, depth - 1)
            elif depth == 0:
                out.append(ch)
        names = re.findall(r"(?:^|,)(\w+):", "".join(out))
        cols.append(set(names))
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join node names in plan order."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan_string(df),
    )


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when at least one HashAggregate pair does partial -> final
    (map-side combine before the exchange)."""
    p = plan_string(df)
    return "partial_" in p or bool(re.search(r"Functions \[\d*partial", p))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in plan_string(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (wider spans = more of the
    plan runs as generated JVM code)."""
    ids = re.findall(r"WholeStageCodegen \((\d+)\)", plan_string(df, "simple"))
    return len(set(ids))
