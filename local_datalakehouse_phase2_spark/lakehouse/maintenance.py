"""Maintenance procedures — the reference's core domain (SURVEY.md §2.10).

Each maps one `CALL nessie.system.<proc>(...)` from the runbook onto a
plain PySpark job + transaction-log commit:

- M1 rewrite_data_files    /root/reference/SPARK_ICEBERG_GUIDE.md:228-240
- M2 rewrite_manifests     :243-248  (= log checkpointing here)
- M3 expire_snapshots      :253-268  (retain_last / older_than, UTC)
- M4 remove_orphan_files   :272-280  (>= 24 h safety floor at :274)
- M5 rollback_to_snapshot  :304-316
- M6 rewrite_position/equality_deletes (:17) are no-ops by design:
  this table format is copy-on-write, so delete files never exist.

Safety gates from the runbook: destructive ops honor
`gc.enabled='false'` (:218-224) and the orphan sweep refuses cutoffs
younger than 24 h (:274).

Scale: the only data-sized work (compaction's read+rewrite) is a
distributed Spark job whose output file count is computed from the
EXACT byte total in the log — no sampling. Expiry/orphan/rollback
touch metadata and do O(#files) filesystem ops, same as Iceberg's
driver-side planning.
"""

from __future__ import annotations

import math
import os
import time

from .log import CommitConflictError, FileInfo, LogEntry
from .table import (
    DEFAULT_TARGET_FILE_SIZE,
    PROP_GC_ENABLED,
    LakehouseTable,
)

ORPHAN_SAFETY_SECONDS = 24 * 3600  # guide :274


class MaintenanceError(RuntimeError):
    pass


def _check_gc_enabled(table: LakehouseTable, what: str) -> None:
    if table.properties().get(PROP_GC_ENABLED, "true").lower() == "false":
        raise MaintenanceError(
            f"{what} blocked: table {table.identifier} has gc.enabled=false "
            "(see reference guide :218-224)"
        )


_Z_BITS = 16  # per-column resolution: 2^16 buckets, plenty below ~64k files


def _zvalue_column(df, cols: list[str]):
    """Bit-interleaved Z-value over `cols`, built entirely from JVM-side
    expressions (no UDF): each column is min/max-normalized into a
    16-bit integer (one tiny agg job for the global bounds — the same
    driver-side planning cost as Delta's OPTIMIZE ZORDER), then the
    bits are interleaved round-robin so Z-proximity implies proximity
    in EVERY listed dimension. Numeric, date, and timestamp columns
    supported; nulls sort to bucket 0.

    Min/max normalization is skew-sensitive (a heavy hitter squeezes
    everyone else into few buckets) but cheap and deterministic;
    Iceberg's zorder does the same. For skewed columns, cluster on a
    derived uniform key instead.
    """
    from pyspark.sql import functions as F

    if len(cols) < 2:
        raise MaintenanceError("zorder needs >= 2 sort_order columns (use sort for 1)")
    dtypes = dict(df.dtypes)
    norm_exprs = []
    for c in cols:
        if c not in dtypes:
            raise MaintenanceError(f"zorder column {c!r} not in table schema")
        t = dtypes[c]
        if t == "date":
            e = F.col(c).cast("timestamp").cast("double")
        elif t.startswith("timestamp"):
            e = F.col(c).cast("timestamp").cast("double")
        elif t in ("tinyint", "smallint", "int", "bigint", "float", "double") or t.startswith(
            "decimal"
        ):
            e = F.col(c).cast("double")
        else:
            raise MaintenanceError(
                f"zorder column {c!r} has unsupported type {t} "
                "(numeric/date/timestamp only)"
            )
        norm_exprs.append(e)

    bounds = df.agg(
        *[F.min(e).alias(f"mn{i}") for i, e in enumerate(norm_exprs)],
        *[F.max(e).alias(f"mx{i}") for i, e in enumerate(norm_exprs)],
    ).first()

    top = (1 << _Z_BITS) - 1
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for j, e in enumerate(norm_exprs):
        mn, mx = bounds[f"mn{j}"], bounds[f"mx{j}"]
        if mn is None or mx is None or mx == mn:
            continue  # constant/all-null column contributes nothing
        scaled = F.coalesce(
            F.least(
                F.lit(top).cast("bigint"),
                F.greatest(
                    F.lit(0).cast("bigint"),
                    ((e - F.lit(float(mn))) / F.lit(float(mx - mn)) * top).cast("bigint"),
                ),
            ),
            F.lit(0).cast("bigint"),
        )
        for i in range(_Z_BITS):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1).cast("bigint"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def rewrite_data_files(
    table: LakehouseTable,
    target_file_size_bytes: int = DEFAULT_TARGET_FILE_SIZE,
    min_input_files: int = 1,
    strategy: str = "binpack",
    sort_order: str | None = None,
) -> dict:
    """M1: compact small data files into ~target-size files.

    Mirrors `CALL rewrite_data_files(table, strategy => ...,
    sort_order => ..., options => map('target-file-size-bytes',
    '134217728','min-input-files','1',...))` (guide :231-239; sort
    strategy per Iceberg's rewrite_data_files procedure). One
    distributed read of the current snapshot, one shaped write sized
    from exact logged bytes, one atomic `replace` commit swapping the
    file set.

    - binpack (default): plain repartition — cheapest, one round-robin
      shuffle.
    - sort: range-repartition + in-partition sort on `sort_order`
      columns, so files hold disjoint key ranges and parquet min/max
      footers make selective scans skip whole files/row groups — the
      clustering half of what Z-ordering buys, in one shuffle.
    - zorder: interleave the bits of all `sort_order` columns into one
      Z-value and range-cluster on THAT (Iceberg/Delta OPTIMIZE
      ZORDER): every listed column's range is narrow within each file,
      so predicates on ANY of the columns prune — where `sort` only
      prunes on the leading column. Costs the same single shuffle
      plus one tiny min/max agg job for normalization bounds.
    """
    if strategy not in ("binpack", "sort", "zorder"):
        raise MaintenanceError(f"rewrite_data_files: unknown strategy {strategy!r}")
    if strategy in ("sort", "zorder") and not sort_order:
        raise MaintenanceError(f"rewrite_data_files: {strategy} strategy requires sort_order")
    state = table.log.state_at()
    if len(state) < min_input_files:
        return {"rewritten_files": 0, "added_files": 0, "skipped": True}

    total_bytes = sum(fi.size_bytes for fi in state.values())
    n_files = max(1, math.ceil(total_bytes / target_file_size_bytes))
    df = table.read()
    if strategy == "sort":
        cols = [c.strip() for c in sort_order.split(",") if c.strip()]
        pre = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
        files = table._write_files(pre, shaped=True)
    elif strategy == "zorder":
        cols = [c.strip() for c in sort_order.split(",") if c.strip()]
        z = _zvalue_column(df, cols)
        pre = (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        files = table._write_files(pre, shaped=True)
    else:
        files = table._write_files(df.repartition(n_files), shaped=True)

    def make(version: int) -> LogEntry:
        # commit validation (re-runs on each optimistic retry): the
        # compacted output replaces exactly the files it read; if a
        # racing commit already removed any of them, replacing would
        # resurrect rows that commit deleted
        live = table.log.state_at()
        gone = [p for p in state if p not in live]
        if gone:
            raise CommitConflictError(
                f"rewrite_data_files on {table.identifier}: {len(gone)} input "
                f"file(s) no longer live (e.g. {gone[0]!r}) — re-plan compaction"
            )
        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=time.time(),
            operation="replace",
            added_files=files,
            removed_files=tuple(state.keys()),
        )

    table.log.append(make)
    return {"rewritten_files": len(state), "added_files": len(files), "skipped": False}


def rewrite_manifests(table: LakehouseTable) -> dict:
    """M2: compact commit metadata — write a resolved checkpoint so
    readers replay O(1) entries instead of the whole log (guide :243-248)."""
    v = table.log.write_checkpoint()
    return {"checkpoint_version": v}


def expire_snapshots(
    table: LakehouseTable,
    retain_last: int | None = None,
    older_than: float | None = None,
) -> dict:
    """M3: drop old snapshots and delete data files only they reference
    (guide :253-268). The CURRENT snapshot is always retained — after a
    rollback, "current" is the new head commit, so a rollback target can
    never be expired out from under it.
    """
    _check_gc_enabled(table, "expire_snapshots")
    entries = table.log.entries()
    if not entries:
        return {"expired_snapshots": 0, "deleted_files": 0}
    versions = [e.version for e in entries]
    current = versions[-1]

    keep = {current}
    if retain_last is not None:
        keep.update(versions[-retain_last:])
    if older_than is not None:
        keep.update(v for v, e in zip(versions, entries) if e.committed_at >= older_than)
    if retain_last is None and older_than is None:
        raise MaintenanceError("expire_snapshots needs retain_last and/or older_than")

    expired = [v for v in versions if v not in keep]
    if not expired:
        return {"expired_snapshots": 0, "deleted_files": 0}

    # files referenced by any surviving snapshot stay
    live: set[str] = set()
    for v in sorted(keep):
        live.update(table.log.state_at(v).keys())
    doomed: set[str] = set()
    for v in expired:
        doomed.update(table.log.state_at(v).keys())
    doomed -= live

    # checkpoint at the oldest surviving version FIRST so replay never
    # needs the expired entries, then drop entries, then delete data
    table.log.write_checkpoint(min(keep))
    table.log.remove_entries(expired)
    deleted = 0
    for rel in doomed:
        full = os.path.join(table.table_dir, rel)
        if table.io.exists(full):
            table.io.remove(full)
            deleted += 1
    return {"expired_snapshots": len(expired), "deleted_files": deleted}


def remove_orphan_files(
    table: LakehouseTable,
    older_than: float | None = None,
) -> dict:
    """M4: delete files under the table dir referenced by NO snapshot
    (guide :272-280). Refuses cutoffs younger than 24 h (:274) — files
    may belong to an in-flight commit.
    """
    _check_gc_enabled(table, "remove_orphan_files")
    now = time.time()
    if older_than is None:
        older_than = now - ORPHAN_SAFETY_SECONDS
    if older_than > now - ORPHAN_SAFETY_SECONDS:
        raise MaintenanceError(
            "remove_orphan_files: older_than must be >= 24h in the past (guide :274)"
        )

    referenced: set[str] = set()
    for v in table.log.versions():
        referenced.update(table.log.state_at(v).keys())

    deleted = 0
    for full in table.io.walk_files(table.data_dir):
        rel = os.path.relpath(full, table.table_dir)
        if rel in referenced:
            continue
        if table.io.mtime(full) < older_than:
            table.io.remove(full)
            deleted += 1
    # prune now-empty commit dirs
    table.io.remove_empty_dirs(table.data_dir)
    return {"deleted_files": deleted}


def rollback_to_snapshot(table: LakehouseTable, snapshot_id: int) -> dict:
    """M5: make the table's current state the given snapshot's state
    (guide :304-316). Implemented as a NEW head commit whose file set
    is the target's — history is never rewritten, so rolling forward
    again is just another rollback.
    """
    try:
        target_state = table.log.state_at(snapshot_id)
        table.log.read_entry(snapshot_id)
    except FileNotFoundError:
        raise MaintenanceError(f"snapshot {snapshot_id} does not exist (expired?)")

    def make(version: int) -> LogEntry:
        current = table.log.state_at()
        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=time.time(),
            operation="rollback",
            added_files=tuple(fi for p, fi in target_state.items() if p not in current),
            removed_files=tuple(p for p in current if p not in target_state),
            extra={"rollback_to": snapshot_id},
        )

    e = table.log.append(make)
    return {"rolled_back_to": snapshot_id, "new_snapshot_id": e.snapshot_id}


def rewrite_position_deletes(table: LakehouseTable) -> dict:
    """M6: no-op — copy-on-write format has no delete files (SURVEY.md §2.10)."""
    return {"rewritten_delete_files": 0, "note": "copy-on-write: no delete files exist"}


def rewrite_equality_deletes(table: LakehouseTable) -> dict:
    """M6: no-op — copy-on-write format has no delete files (SURVEY.md §2.10)."""
    return {"rewritten_delete_files": 0, "note": "copy-on-write: no delete files exist"}
