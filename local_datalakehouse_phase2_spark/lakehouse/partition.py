"""Partition specs: Iceberg-style partition transforms for lakehouse
tables.

The reference stack's tables are Iceberg tables, whose defining scale
feature is the partition spec — `PARTITIONED BY (days(ts),
bucket(16, id))` — hidden partitioning where the TRANSFORM of a
column, not the raw column, lays out the data, and the scan planner
prunes whole partitions from metadata (the runbook never creates one,
but the capability is the core of "would this hold at 100 TB":
a time-partitioned 100 TB table answers a one-day query by touching
one day's files).

Re-expressed Spark-first:

- The spec is a table property (`partition.spec`), parsed into
  transforms. Supported (the Iceberg set): identity, `year(c)`,
  `month(c)`, `day(c)`/`days(c)`, `hour(c)`, `bucket(N, c)`,
  `truncate(W, c)`.
- Writes compute each transform as a DERIVED column named
  `__p_<col>[_<kind>]` and use Spark's native
  `write.partitionBy(...)` — so the SOURCE column always stays in the
  data files (Spark drops partition columns from file contents; a
  derived copy means reads of individual files never lose data), and
  the storage layout is plain hive-style dirs any engine can read.
- Each data file records its partition values (`FileInfo.partition`,
  parsed from the dir path — the manifest-entry partition tuple
  analog), and `prune_state` drops files whose partition PROVABLY
  cannot satisfy a filter: equality/range on identity and time
  transforms, equality on bucket (the plan-time hash of the literal —
  something file min/max stats can never do) and truncate.
- Pruning is advisory-only and one-sided, exactly like stats pruning:
  any transform/type/escaping we can't reason about degrades to
  "scan the file", and the residual predicate keeps results exact.

Cite: /root/reference/SPARK_ICEBERG_GUIDE.md:107-110 (table create
with format-version 2 — partition specs are the companion half of a
v2 table definition).
"""

from __future__ import annotations

import datetime as _dt
import re
import zlib
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PROP_PARTITION_SPEC = "partition.spec"
# ";"-joined specs that previously governed writes (spec evolution):
# files written under them still prune via partition_spec_union
PROP_PARTITION_SPEC_HISTORY = "partition.spec.history"

# Spark writes hive-style null partitions under this dir name
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_TRANSFORM_RE = re.compile(
    r"^\s*(?:(year|month|day|days|hour)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)"
    r"|(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)"
    r"|([A-Za-z_][A-Za-z0-9_]*))\s*$"
)


class PartitionSpecError(ValueError):
    pass


@dataclass(frozen=True)
class Transform:
    kind: str  # identity | year | month | day | hour | bucket | truncate
    source: str
    param: int | None = None  # N for bucket, W for truncate

    @property
    def pname(self) -> str:
        """Partition-dir column name. Parameterized transforms ENCODE
        their parameter (`__p_id_bucket16`): under spec evolution a
        bucket width change must produce a DIFFERENT partition column —
        pruning a bucket(8)-era file with the bucket(16) hash would be
        silently wrong (Iceberg gets the same isolation from per-file
        spec ids)."""
        if self.kind == "identity":
            return f"__p_{self.source}"
        if self.kind in ("bucket", "truncate"):
            return f"__p_{self.source}_{self.kind}{self.param}"
        return f"__p_{self.source}_{self.kind}"

    # ---- write side --------------------------------------------------

    def expr(self, df: DataFrame) -> Column:
        """The Spark column computing this transform — JVM-side
        expressions only, evaluated once per row at write time."""
        c = F.col(self.source)
        if self.kind == "identity":
            return c
        if self.kind == "year":
            return F.date_format(c.cast("timestamp"), "yyyy")
        if self.kind == "month":
            return F.date_format(c.cast("timestamp"), "yyyy-MM")
        if self.kind == "day":
            return F.date_format(c.cast("timestamp"), "yyyy-MM-dd")
        if self.kind == "hour":
            return F.date_format(c.cast("timestamp"), "yyyy-MM-dd-HH")
        if self.kind == "bucket":
            # crc32 over the string rendering: bit-identical to Python's
            # zlib.crc32 at plan time, which is what makes a literal's
            # bucket computable WITHOUT Spark for pruning
            return F.pmod(F.crc32(c.cast("string")), F.lit(self.param)).cast("int")
        if self.kind == "truncate":
            dtypes = dict(df.dtypes)
            t = dtypes.get(self.source, "string")
            if t in ("tinyint", "smallint", "int", "bigint"):
                # Iceberg's integer truncate: v - (((v % W) + W) % W)
                # (floors toward -inf so negatives band correctly)
                w = self.param
                return F.expr(
                    f"`{self.source}` - (((`{self.source}` % {w}) + {w}) % {w})"
                )
            return F.substring(c.cast("string"), 1, self.param)
        raise AssertionError(self.kind)

    # ---- plan side ---------------------------------------------------

    def literal_value(self, v) -> str | None:
        """The partition-dir string this transform maps a Python filter
        literal to, or None when not computable (=> no pruning)."""
        if v is None:
            return None
        if self.kind == "identity":
            if isinstance(v, bool) or not isinstance(v, (int, str)):
                return None  # float/decimal/date renderings are risky
            return str(v)
        if self.kind in ("year", "month", "day", "hour"):
            if not isinstance(v, (_dt.date, _dt.datetime)):
                return None
            fmt = {
                "year": "%Y",
                "month": "%Y-%m",
                "day": "%Y-%m-%d",
                "hour": "%Y-%m-%d-%H",
            }[self.kind]
            if self.kind == "hour" and not isinstance(v, _dt.datetime):
                return None
            return v.strftime(fmt)
        if self.kind == "bucket":
            if isinstance(v, bool) or not isinstance(v, (int, str)):
                return None
            return str(zlib.crc32(str(v).encode("utf-8")) % self.param)
        if self.kind == "truncate":
            if isinstance(v, bool):
                return None
            if isinstance(v, int):
                w = self.param
                return str(v - (((v % w) + w) % w))
            if isinstance(v, str):
                return v[: self.param]
            return None
        raise AssertionError(self.kind)

    def may_match(self, op: str, v, pvalue: str) -> bool:
        """Can a file whose partition value is `pvalue` hold a row
        satisfying `source op v`? True unless provably not."""
        if "%" in pvalue:
            return True  # hive-escaped value: don't reason about it
        if pvalue == HIVE_NULL:
            return self._null_partition_may_match(op, v)
        if op == "is_null":
            return False  # non-null partition: no null rows
        if op == "not_null":
            return True
        if op == "in":
            vals = list(v) if isinstance(v, (list, tuple, set, frozenset)) else None
            if vals is None:
                return True
            decided = [self.literal_value(x) for x in vals]
            if any(d is None for d in decided):
                return True
            return any(self._cmp("=", d, pvalue) for d in decided)
        lit = self.literal_value(v)
        if lit is None:
            return True
        return self._cmp(op, lit, pvalue, self._at_bucket_start(v))

    def _at_bucket_start(self, v) -> bool:
        """Is the literal exactly at its time bucket's lower boundary?
        `ts < '2024-03-03'` (midnight) excludes the WHOLE day partition
        2024-03-03 — the classic [start, end) day-range query prunes
        both boundary partitions only when this is detected."""
        if self.kind not in ("year", "month", "day", "hour"):
            return False
        if isinstance(v, _dt.datetime):
            t = (v.hour, v.minute, v.second, v.microsecond)
            if self.kind == "hour":
                return t[1:] == (0, 0, 0)
            if t != (0, 0, 0, 0):
                return False
            if self.kind == "day":
                return True
            if self.kind == "month":
                return v.day == 1
            return v.month == 1 and v.day == 1
        if isinstance(v, _dt.date):
            if self.kind == "day":
                return True
            if self.kind == "month":
                return v.day == 1
            if self.kind == "year":
                return v.month == 1 and v.day == 1
        return False

    def _null_partition_may_match(self, op: str, v) -> bool:
        """Hive-layout quirk: the __HIVE_DEFAULT_PARTITION__ dir holds
        rows whose transform value is NULL — and, for IDENTITY string
        partitions, rows whose value is the EMPTY STRING (Spark's hive
        writer conflates the two; naively treating the dir as null-only
        silently dropped ''-valued rows from pruned reads). Derived
        transforms only produce NULL there (a non-null '' still hashes
        /formats to a real value), so for them the dir is null-only."""
        if op == "is_null":
            return True
        if self.kind != "identity":
            return False  # null rows match no other predicate
        # identity: a '' row may hide here — decide whether '' can
        # satisfy the predicate (string columns only; other types
        # cannot produce '' and their null rows match nothing)
        if op == "not_null":
            return True
        if op == "in":
            vals = v if isinstance(v, (list, tuple, set, frozenset)) else None
            return vals is None or any(isinstance(x, str) and x == "" for x in vals)
        if not isinstance(v, str):
            return False
        if op in ("=", "=="):
            return v == ""
        if op == "!=":
            return v != ""
        if op == "<":
            return "" < v
        if op == "<=":
            return "" <= v
        if op == ">":
            return "" > v  # never
        if op == ">=":
            return "" >= v
        return True

    def _cmp(self, op: str, lit: str, pvalue: str, lit_at_start: bool = False) -> bool:
        if op in ("=", "=="):
            return lit == pvalue
        if op == "!=":
            # identity partitions hold EXACTLY their value; a file whose
            # value equals the literal has no other rows. Derived
            # transforms collapse many values into one partition, so a
            # match there proves nothing.
            if self.kind == "identity":
                return lit != pvalue
            return True
        if self.kind == "bucket":
            return True  # hash order is meaningless for ranges
        if self.kind == "truncate" and op in ("<", "<=", ">", ">="):
            return True  # prefix order vs value order: not worth the risk
        # identity (int/string) and time transforms: partition strings
        # order consistently with source values (zero-padded dates,
        # same-width years). Integers need numeric compare.
        try:
            a, b = (int(pvalue), int(lit)) if pvalue.lstrip("-").isdigit() and lit.lstrip("-").isdigit() else (pvalue, lit)
        except ValueError:
            a, b = pvalue, lit
        if type(a) is not type(b):
            return True
        # file-side value `a` vs literal `b`: a DERIVED time transform
        # bucketizes a range, so boundary partitions stay inclusive —
        # EXCEPT `<` with the literal exactly at the bucket's start,
        # where the boundary partition provably holds no earlier row
        if op == "<":
            if self.kind == "identity":
                return a < b
            return a < b if lit_at_start else a <= b
        if op == "<=":
            return a <= b
        if op == ">":
            return a >= b if self.kind != "identity" else a > b
        if op == ">=":
            return a >= b
        return True


def _split_transforms(spec: str) -> list[str]:
    """Split on top-level commas only — `bucket(16, id)` holds one."""
    parts, depth, cur = [], 0, []
    for ch in spec:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def parse_spec(spec: str) -> list[Transform]:
    """Parse `days(ts), bucket(16, id), region` into transforms."""
    out: list[Transform] = []
    for part in _split_transforms(spec):
        if not part.strip():
            continue
        m = _TRANSFORM_RE.match(part)
        if not m:
            raise PartitionSpecError(f"bad partition transform: {part.strip()!r}")
        if m.group(1):
            kind = "day" if m.group(1) == "days" else m.group(1)
            out.append(Transform(kind=kind, source=m.group(2)))
        elif m.group(3):
            out.append(
                Transform(kind=m.group(3), source=m.group(5), param=int(m.group(4)))
            )
        else:
            out.append(Transform(kind="identity", source=m.group(6)))
    if not out:
        raise PartitionSpecError("empty partition spec")
    names = [t.pname for t in out]
    if len(set(names)) != len(names):
        raise PartitionSpecError(f"duplicate transforms in spec: {spec!r}")
    return out


def render_transform(t: Transform) -> str:
    """The spec-string form of a transform (parse_spec's inverse)."""
    if t.kind == "identity":
        return t.source
    if t.kind in ("bucket", "truncate"):
        return f"{t.kind}({t.param}, {t.source})"
    return f"{t.kind}({t.source})"


def validate_spec_against_schema(spec: list[Transform], fields: dict[str, str]) -> list[str]:
    """Validate transform sources against `{column: simple type}`.
    Returns error strings (empty = valid) so callers raise their own
    exception types (CatalogError at CREATE, ValueError at evolve)."""
    errors = []
    missing = [tr.source for tr in spec if tr.source not in fields]
    if missing:
        errors.append(f"partition transform source column(s) {missing} not in schema")
    for tr in spec:
        # time transforms demand a temporal source: on a string column,
        # uncastable values would silently land in the null partition
        # and partition pruning would mis-prune them (null-partition
        # reasoning assumes null source)
        if tr.source in fields and tr.kind in ("year", "month", "day", "hour") and not (
            fields[tr.source] == "date" or fields[tr.source].startswith("timestamp")
        ):
            errors.append(
                f"{tr.kind}({tr.source}): time transforms need a "
                f"date/timestamp column, got {fields[tr.source]}"
            )
    return errors


def parse_partition_from_path(rel_path: str) -> dict[str, str] | None:
    """Partition values from a data-file path's `name=value` dir
    segments (hive layout), or None for unpartitioned files."""
    parts = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" in seg and seg.startswith("__p_"):
            k, _, val = seg.partition("=")
            parts[k] = val
    return parts or None


def prune_state(state: dict, filters, spec: list[Transform]) -> tuple[dict, int]:
    """Drop data files whose partition values prove no row can satisfy
    the conjunctive filters. Same contract as pruning.prune_files:
    advisory-only, one-sided, metadata-only.

    Legacy pname alias: bucket/truncate dirs written before the
    parameter was encoded in the pname (`__p_id_bucket`, an on-disk
    layout predating `__p_id_bucket16`) still prune — but ONLY when the
    spec union contains exactly one transform of that (source, kind),
    so the legacy name unambiguously identifies the parameter it was
    written with. Two bucket widths in the history make the bare name
    ambiguous; those files degrade to "scan", never to a wrong prune."""
    by_source: dict[str, list[Transform]] = {}
    legacy_counts: dict[str, int] = {}
    for t in spec:
        by_source.setdefault(t.source, []).append(t)
        if t.kind in ("bucket", "truncate"):
            legacy = f"__p_{t.source}_{t.kind}"
            legacy_counts[legacy] = legacy_counts.get(legacy, 0) + 1
    kept = {}
    for p, fi in state.items():
        part = getattr(fi, "partition", None)
        if not part:
            kept[p] = fi  # pre-spec file: must scan
            continue
        ok = True
        for col, op, val in filters:
            for t in by_source.get(col, ()):  # every transform of this col may prune
                pv = part.get(t.pname)
                if pv is None and t.kind in ("bucket", "truncate"):
                    legacy = f"__p_{t.source}_{t.kind}"
                    if legacy_counts.get(legacy) == 1:
                        pv = part.get(legacy)
                if pv is not None and not t.may_match(op, val, pv):
                    ok = False
                    break
            if not ok:
                break
        if ok:
            kept[p] = fi
    return kept, len(state) - len(kept)
