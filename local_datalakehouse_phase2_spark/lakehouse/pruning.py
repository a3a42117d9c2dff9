"""Scan planning: prune data files from a snapshot using the per-file
column min/max/null-count metrics recorded in the commit log.

This is the lakehouse's analog of Iceberg's manifest-level pruning
(the reference stack gets it from Iceberg metadata + the Spark scan
builder): a selective query consults KB-sized metadata and opens only
the files whose recorded value ranges can possibly satisfy the
predicate. On a 100 TB table clustered by `rewrite_data_files
(strategy='sort')`, a point/range query goes from "scan everything"
to "scan the one file whose range covers the key" — before any Spark
job starts, with zero data IO.

Safety model: pruning is advisory-only and one-sided. A file is
dropped ONLY when its recorded stats PROVE no row can match; missing
stats, unknown columns, type mismatches, and unsupported operators
all degrade to "scan the file". The residual predicate is always
applied to the scan output, so results are exact even if stats were
absent entirely.

Filters are conjunctive triples `(column, op, value)` with ops
`= == != < <= > >= in is_null not_null` (pyarrow/Iceberg expression
style). `is_null`/`not_null` take no value (pass None).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .log import FileInfo

Filter = tuple  # (column, op, value)

SUPPORTED_OPS = frozenset({"=", "==", "!=", "<", "<=", ">", ">=", "in", "is_null", "not_null"})

_COMPARE_OPS = frozenset({"=", "==", "!=", "<", "<=", ">", ">=", "in"})


def validate_filters(filters: Sequence[Filter]) -> None:
    for flt in filters:
        if len(flt) != 3:
            raise ValueError(f"filter must be (column, op, value): {flt!r}")
        col, op, val = flt
        if not isinstance(col, str):
            raise ValueError(f"filter column must be a string: {flt!r}")
        if op not in SUPPORTED_OPS:
            raise ValueError(f"unsupported filter op {op!r} (supported: {sorted(SUPPORTED_OPS)})")
        if op == "in" and not isinstance(val, (list, tuple, set, frozenset)):
            raise ValueError(f"'in' filter needs a collection value: {flt!r}")


def _canon(v: Any) -> Any:
    """Predicate-literal encoding matching `fs.stats_from_footer`:
    datetimes/dates become ISO strings so they compare against stored
    stats in the same domain."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            # normalize zoned literals to UTC: stats strings for
            # adjusted-to-UTC columns carry +00:00, and comparing a
            # +05:00 rendering lexicographically against them would
            # mis-prune chronologically-in-range instants
            v = v.astimezone(_dt.timezone.utc)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


_ISO_TS_RE = None  # compiled lazily below


def _looks_iso_timestamp(s: Any) -> bool:
    global _ISO_TS_RE
    if not isinstance(s, str):
        return False
    if _ISO_TS_RE is None:
        import re

        _ISO_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}")
    return bool(_ISO_TS_RE.match(s))


def _comparable(a: Any, b: Any) -> bool:
    """True when `<`/`>` between a and b is meaningful (same family;
    int/float mix allowed, bool excluded from the numeric family)."""
    num = (int, float)
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, num) and isinstance(b, num):
        return True
    return type(a) is type(b)


def _chunk_may_match(op: str, val: Any, lo: Any, hi: Any, nulls: int, rows: int) -> bool:
    """Can any row in a file with bounds [lo, hi] satisfy `col op val`?
    Returns True (scan) unless the stats prove otherwise."""
    if op == "is_null":
        return nulls > 0
    if op == "not_null":
        return rows > nulls
    # comparison ops match only non-null values
    if lo is None and hi is None:
        return False  # column is entirely null in this file
    def _iso_mismatch(orig: Any, canon: Any) -> bool:
        # a date/datetime literal — or a PLAIN-STRING timestamp literal
        # like '2024-01-01 10:00:00' — against timestamp-shaped stats
        # of a different string length: lexicographic comparison across
        # the two renderings is not the comparison Spark will do (it
        # casts), so scan instead of risking a mis-prune
        if (
            not isinstance(lo, str)
            or not isinstance(canon, str)
            or len(lo) == len(canon)
        ):
            return False
        if isinstance(orig, (_dt.date, _dt.datetime)):
            return True
        return _looks_iso_timestamp(orig) and _looks_iso_timestamp(lo)

    def _is_nan(v: Any) -> bool:
        return isinstance(v, float) and v != v

    if op == "in":
        if any(_is_nan(v) for v in val):
            return True  # Spark orders NaN above everything; let it decide
    elif _is_nan(val):
        return True

    if op == "in":
        pairs = [(v, _canon(v)) for v in val]
        if not pairs:
            return False
        if any(_iso_mismatch(o, c) for o, c in pairs):
            return True
        vals = [c for _o, c in pairs]
        if not all(_comparable(v, lo) for v in vals):
            return True
        return any(lo <= v <= hi for v in vals)
    orig_val, val = val, _canon(val)
    if _iso_mismatch(orig_val, val):
        return True
    if not _comparable(val, lo):
        return True  # type-mismatched predicate: let Spark decide
    if op in ("=", "=="):
        return lo <= val <= hi
    if op == "!=":
        return not (lo == hi == val)
    if op == "<":
        return lo < val
    if op == "<=":
        return lo <= val
    if op == ">":
        return hi > val
    if op == ">=":
        return hi >= val
    raise AssertionError(op)


def file_may_match(fi: FileInfo, filters: Sequence[Filter]) -> bool:
    """Conjunction: the file survives only if EVERY filter might match.
    Files without stats (pre-tracking commits) always survive."""
    stats = fi.stats or {}
    for col, op, val in filters:
        if col not in stats:
            continue  # unknown column stats: must scan
        lo, hi, nulls = stats[col]
        if not _chunk_may_match(op, val, lo, hi, int(nulls or 0), fi.row_count):
            return False
    return True


def prune_files(
    state: dict[str, FileInfo], filters: Sequence[Filter]
) -> tuple[dict[str, FileInfo], int]:
    """(surviving path->FileInfo, number pruned). Metadata-only — no
    Spark job, no file IO; cost is O(files x filters) over in-memory
    log state, the same planning cost Iceberg pays over manifests."""
    validate_filters(filters)
    kept = {p: fi for p, fi in state.items() if file_may_match(fi, filters)}
    return kept, len(state) - len(kept)


def residual_expr(filters: Sequence[Filter]) -> Column:
    """The exact Spark predicate for `filters` — ANDed over the scan so
    correctness never depends on stats quality. Comparisons use the
    original (un-canonicalized) literals: Spark compares in the column's
    native type."""
    expr = F.lit(True)
    for col, op, val in filters:
        c = F.col(col)
        if op in ("=", "=="):
            term = c == F.lit(val)
        elif op == "!=":
            term = c != F.lit(val)
        elif op == "<":
            term = c < F.lit(val)
        elif op == "<=":
            term = c <= F.lit(val)
        elif op == ">":
            term = c > F.lit(val)
        elif op == ">=":
            term = c >= F.lit(val)
        elif op == "in":
            term = c.isin([v for v in val])
        elif op == "is_null":
            term = c.isNull()
        elif op == "not_null":
            term = c.isNotNull()
        else:
            raise AssertionError(op)
        expr = expr & term
    return expr
