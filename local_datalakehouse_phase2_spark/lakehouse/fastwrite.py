"""Driver-side parquet writer for LocalRelation-backed tiny commits.

A lakehouse commit of a driver-known frame (metadata rows, lifecycle
fixtures, SQL result feeds — every `localrows.local_df` product) does
not need a Spark job at all: the rows already live on the driver, and
`df.write.parquet` spends its ~180-200 ms floor on job scheduling plus
the Hadoop committer's temporary-directory rename dance, not on IO.
This module converts such a frame's collected rows straight to ONE
pyarrow parquet file (~5 ms), preserving everything the engine and the
DuckDB second engine read back:

- value fidelity: types map 1:1 (timestamps written as
  TIMESTAMP(MICROS) with the correct isAdjustedToUTC flag per
  TimestampType vs TimestampNTZType; collected naive datetimes are
  interpreted in the driver's local zone exactly as PySpark rendered
  them);
- footer stats: pyarrow records the same per-column min/max/null-count
  metrics `TableFile._scan_written` harvests into FileInfo for scan
  pruning;
- row order: collect order == stored order, so file_row_number-based
  position deletes planned later against the file stay valid.

`Table._write_files` gates the fast path hard (plain-local path, no
partition spec, distribution-mode none, no sort order, non-empty,
under the target file size) and falls back to the Spark writer for
anything this module returns None for. At 100 TB the path is never
data-bearing — real data never routes through literal rows — but a
1000-executor pipeline's per-commit METADATA writes stop paying a
cluster job each.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import types as T

__all__ = ["rows_to_arrow", "write_rows"]

# conversion cap: beyond this the frame is not "tiny metadata" and the
# Spark writer's distribution machinery should own it
MAX_ROWS = 10_000


def _arrow_type(dt: T.DataType) -> pa.DataType | None:
    """Arrow type for a Spark type, or None when the fast path should
    not claim the write (structs/maps — the Spark writer handles them
    with semantics we'd rather not re-derive)."""
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.ByteType):
        return pa.int8()
    if isinstance(dt, T.ShortType):
        return pa.int16()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.TimestampType):
        # Spark TimestampType is an instant; `write_rows` stores it as
        # the same deprecated INT96 physical type Spark's writer emits,
        # so every reader types the column identically to a
        # Spark-written file (DuckDB renders INT96 as naive TIMESTAMP —
        # a MICROS/adjustedToUTC column would render TIMESTAMPTZ and
        # change oracle value hashes)
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.TimestampNTZType):
        # NTZ under the INT96 flag would round-trip as an instant —
        # wrong type; leave NTZ frames to the Spark writer
        return None
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        inner = _arrow_type(dt.elementType)
        return pa.list_(inner) if inner is not None else None
    return None


def _convert(v, dt: T.DataType):
    """Map one collected Python value to its arrow-ingestible form."""
    if v is None:
        return None
    if isinstance(dt, T.TimestampType):
        # PySpark collect renders instants as NAIVE datetimes in the
        # driver's local zone; astimezone() re-attaches that zone (its
        # documented naive-input behavior), making the instant exact
        # under any host TZ before arrow normalizes it to UTC
        if v.tzinfo is None:
            v = v.astimezone()
        v = v.astimezone(_dt.timezone.utc)
        if v.year < 1900:
            # INT96 files without Spark's writer-version footer key hit
            # Spark's unknown-writer int96 rebase heuristic on read: an
            # ancient instant could raise SparkUpgradeException or
            # rebase differently than a Spark-written file. Decline the
            # fast path (ValueError -> rows_to_arrow returns None).
            raise ValueError("pre-1900 timestamp: leave to the Spark writer")
        return v
    if isinstance(dt, T.DateType):
        if v.year < 1583:
            # proleptic-vs-hybrid calendar rebase applies to ancient
            # dates the same way; decline rather than re-derive it
            raise ValueError("pre-1583 date: leave to the Spark writer")
        return v
    if isinstance(dt, T.ArrayType):
        return [_convert(e, dt.elementType) for e in v]
    return v


def rows_to_arrow(rows, schema: T.StructType) -> pa.Table | None:
    """Collected Rows + their Spark schema -> a pyarrow Table, or None
    when a column's type is outside the supported map (caller falls
    back to the Spark writer)."""
    if len(rows) > MAX_ROWS:
        return None
    fields = []
    for f in schema.fields:
        at = _arrow_type(f.dataType)
        if at is None:
            return None
        fields.append(pa.field(f.name, at, nullable=True))
    arrow_schema = pa.schema(fields)
    cols = []
    try:
        for i, f in enumerate(schema.fields):
            vals = [_convert(r[i], f.dataType) for r in rows]
            cols.append(pa.array(vals, type=arrow_schema.field(i).type))
    except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, TypeError,
            OverflowError, AttributeError):
        return None
    return pa.Table.from_arrays(cols, schema=arrow_schema)


def write_rows(table: pa.Table, path: str) -> None:
    """One parquet file, snappy like Spark's default, stats on (the
    footer metrics _scan_written reads are written by default).
    Timestamps go out as INT96 exactly like Spark's writer (see
    `_arrow_type`)."""
    pq.write_table(
        table, path, compression="snappy", use_deprecated_int96_timestamps=True
    )
