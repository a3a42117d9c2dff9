"""Managed multi-version table: reads, snapshot-committing writes,
time travel, and the `snapshots`/`files` metadata views.

Re-expresses, Spark-first, what the reference gets from Iceberg:

- snapshot-per-INSERT commits (/root/reference/SPARK_ICEBERG_GUIDE.md:122)
- metadata tables `<t>.snapshots` (`snapshot_id, committed_at,
  operation` — :132-134) and `<t>.files` (`file_path,
  file_size_in_bytes, content` — :175-185)
- `write.target-file-size-bytes` and `write.distribution-mode`
  TBLPROPERTIES honored by the writer (:108-109, :324-328)
- time-travel reads (`VERSION AS OF` analog; rollback at :304-316)

Scale notes: the data path is pure Spark — writers are distributed
parquet jobs sized by `write.target-file-size-bytes`, readers are
`spark.read.parquet(<live files>)` so Catalyst keeps predicate
pushdown / column pruning / row-group skipping. Only the commit
metadata (KBs of JSON) is handled on the driver, the same division of
labor as Iceberg's driver-side commit. All file listing/size/delete
goes through the injected `FileIO` (see fs.py) — `LocalFileIO` by
default, `HadoopFileIO` for hdfs://`/`s3a://`/`file:` URIs via the
JVM Hadoop FileSystem API, exercised in tests/test_fileio.py.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import pruning
from .fs import FileIO, LocalFileIO
from .log import CommitConflictError, FileInfo, LogEntry, TransactionLog

DEFAULT_TARGET_FILE_SIZE = 128 * 1024 * 1024  # Iceberg default; guide :234

PROP_TARGET_FILE_SIZE = "write.target-file-size-bytes"
PROP_DISTRIBUTION_MODE = "write.distribution-mode"  # none | hash
PROP_HASH_COLUMNS = "write.hash-columns"  # comma list for hash mode
PROP_GC_ENABLED = "gc.enabled"  # guide :218-224

SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("added_files", T.IntegerType(), False),
        T.StructField("removed_files", T.IntegerType(), False),
        T.StructField("total_files", T.IntegerType(), False),
        T.StructField("total_records", T.LongType(), False),
    ]
)

FILES_SCHEMA = T.StructType(
    [
        T.StructField("content", T.IntegerType(), False),
        T.StructField("file_path", T.StringType(), False),
        T.StructField("file_size_in_bytes", T.LongType(), False),
        T.StructField("record_count", T.LongType(), False),
        # Iceberg files-table readable_metrics analog: per-column
        # [min, max, null_count] rendered as strings for display
        T.StructField(
            "column_stats",
            T.MapType(T.StringType(), T.ArrayType(T.StringType(), True)),
            True,
        ),
    ]
)


class LakehouseTable:
    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        table_dir: str,
        io: FileIO | None = None,
    ):
        self.spark = spark
        self.identifier = identifier
        self.table_dir = table_dir
        self.io = io or LocalFileIO()
        self.data_dir = os.path.join(table_dir, "data")
        self.log = TransactionLog(os.path.join(table_dir, "metadata"), io=self.io)

    # ---- properties --------------------------------------------------

    def properties(self) -> dict[str, str]:
        return self.log.properties_at()

    def set_properties(self, updates: dict[str, str]) -> LogEntry:
        """ALTER TABLE ... SET TBLPROPERTIES (guide :220-224, :324-328)."""

        def make(version: int) -> LogEntry:
            props = self.log.properties_at()
            props.update({k: str(v) for k, v in updates.items()})
            return LogEntry(
                version=version,
                snapshot_id=version,
                committed_at=time.time(),
                operation="set_properties",
                properties=props,
            )

        return self.log.append(make)

    # ---- reads -------------------------------------------------------

    def read(
        self,
        version: int | None = None,
        as_of: float | None = None,
        filters: list[tuple] | None = None,
        ref: str | None = None,
    ) -> DataFrame:
        """Current-snapshot scan, or time travel by snapshot id
        (`VERSION AS OF`) or timestamp (`TIMESTAMP AS OF`). Projects
        through the schema recorded AS OF that version, so time travel
        sees the table as it was — including pre-evolution columns.

        `filters` — conjunctive `(column, op, value)` triples (see
        `pruning.SUPPORTED_OPS`) — engage metadata-level scan planning:
        files whose logged min/max ranges cannot satisfy the predicate
        are dropped BEFORE the DataFrame is built (Iceberg manifest
        pruning), and the exact predicate is re-applied to the scan so
        results never depend on stats quality. On a table clustered by
        `rewrite_data_files(strategy='sort')` a selective read touches
        only the files whose key range overlaps the filter.

        `ref` — read at a named branch/tag pointer (`VERSION AS OF
        'ref'`; the Nessie `ref=` analog, see create_branch)."""
        if ref is not None:
            if version is not None or as_of is not None:
                raise ValueError("pass only one of ref / version / as_of")
            version = self.log.resolve_ref(ref)
        if as_of is not None:
            eligible = [
                e.version
                for e in self.log.entries()
                # stage snapshots are outside the main lineage: only an
                # explicit by-version audit read may address one —
                # timestamp travel must never leak unpublished data
                if e.committed_at <= as_of and e.operation != "stage"
            ]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of}")
            version = max(eligible)
        elif version is not None and version not in self.log.versions():
            raise ValueError(f"snapshot {version} does not exist (expired?)")
        state = self.log.state_at(version)
        if version is not None:
            entry = self.log.read_entry(version)
            if entry.operation == "stage":
                # the AUDIT read of write-audit-publish: addressing a
                # stage snapshot by version shows main-as-of-then PLUS
                # the staged files (Iceberg's WAP snapshot reads the
                # same way) — this is how staged data is validated
                # before publish_changes
                state = {**state, **{fi.path: fi for fi in entry.added_files}}
        if filters:
            state, _ = pruning.prune_files(state, filters)
        if not state:
            return self.spark.createDataFrame([], self.schema(version) or self._schema())
        paths = [os.path.join(self.table_dir, p) for p in state]
        df = self._read_paths(paths, version=version)
        if filters:
            df = df.filter(pruning.residual_expr(filters))
        return df

    def scan_plan(self, filters: list[tuple], version: int | None = None) -> dict:
        """Planning-only view of what `read(filters=...)` will touch:
        {files_total, files_scanned, files_pruned, rows_total,
        rows_scanned_max}. Metadata-only — no Spark job — so tests and
        operators can assert pruning without tracing the scan."""
        state = self.log.state_at(version)
        kept, pruned = pruning.prune_files(state, filters)
        return {
            "files_total": len(state),
            "files_scanned": len(kept),
            "files_pruned": pruned,
            "rows_total": sum(fi.row_count for fi in state.values()),
            "rows_scanned_max": sum(fi.row_count for fi in kept.values()),
        }

    def _read_paths(self, paths: list[str], version: int | None = None) -> DataFrame:
        """Scan data files through the log-recorded schema (Iceberg
        keeps schema in table metadata the same way): files written
        before an added column project it as null; no footer-merge pass
        needed. Falls back to parquet self-description for tables that
        never recorded a schema."""
        st = self.schema(version)
        reader = self.spark.read
        if st is not None:
            reader = reader.schema(st)
        return reader.parquet(*paths)

    def add_column(self, name: str, data_type: str) -> LogEntry:
        """ALTER TABLE ... ADD COLUMN analog: records the widened schema
        as a metadata-only commit (no data files touched); existing rows
        read the new column as null immediately."""
        current = self.schema() or self._schema()
        if any(f.name == name for f in current.fields):
            raise ValueError(f"column {name} already exists")
        evolved = T.StructType(
            list(current.fields)
            + [T.StructField(name, T._parse_datatype_string(data_type), True)]
        )

        def make(version: int) -> LogEntry:
            return LogEntry(
                version=version,
                snapshot_id=version,
                committed_at=time.time(),
                operation="add_column",
                properties=self.log.properties_at() or None,
                extra={"schema": evolved.simpleString()},
            )

        return self.log.append(make)

    def schema(self, version: int | None = None) -> T.StructType | None:
        """The schema recorded in the log as of `version` (default
        latest), or None if this table predates schema tracking.
        Checkpoint-aware: survives snapshot expiry of the commit that
        recorded it."""
        ddl = self.log.schema_ddl_at(version)
        return T._parse_datatype_string(ddl) if ddl else None

    # widening lattices per family (Iceberg's legal type promotions)
    _PROMOTION_RANK = {
        "tinyint": ("int", 0), "smallint": ("int", 1),
        "int": ("int", 2), "bigint": ("int", 3),
        "float": ("float", 0), "double": ("float", 1),
    }

    def _align_for_write(self, df: DataFrame) -> tuple[DataFrame, str | None]:
        """Reconcile a write's schema with the table schema; returns the
        (possibly cast) frame and the new schema DDL to record, or None
        if the table schema is unchanged.

        Evolution rules (the safe subset of Iceberg's):
        - adding columns is allowed (appended after existing fields;
          they read as null from older files)
        - within a numeric family, the NARROWER side widens: narrower
          data upcasts to the table type; wider data promotes the table
          schema (int->bigint, float->double — Iceberg's legal
          promotions, lossless so old files still read correctly)
        - dropping/renaming is not expressible by a write (missing
          columns raise); cross-family type changes raise
        """
        current = self.schema()
        if current is None:
            return df, df.schema.simpleString()
        cur_by_name = {f.name: f for f in current.fields}
        new_by_name = {f.name: f for f in df.schema.fields}
        missing = [n for n in cur_by_name if n not in new_by_name]
        if missing:
            raise ValueError(f"write is missing table columns {missing}")
        casts: dict[str, T.DataType] = {}  # df columns to upcast
        widened: dict[str, T.DataType] = {}  # table columns to promote
        for name, f in new_by_name.items():
            if name not in cur_by_name or f.dataType == cur_by_name[name].dataType:
                continue
            t_s = cur_by_name[name].dataType.simpleString()
            d_s = f.dataType.simpleString()
            t_fam, t_rank = self._PROMOTION_RANK.get(t_s, (t_s, -1))
            d_fam, d_rank = self._PROMOTION_RANK.get(d_s, (d_s, -1))
            if t_fam != d_fam or t_rank < 0 or d_rank < 0:
                raise ValueError(
                    f"type change for column {name}: {t_s} -> {d_s} (not supported)"
                )
            if d_rank < t_rank:
                casts[name] = cur_by_name[name].dataType
            else:
                widened[name] = f.dataType
        if casts:
            df = df.select(
                *[
                    F.col(c.name).cast(casts[c.name]) if c.name in casts else F.col(c.name)
                    for c in df.schema.fields
                ]
            )
        added = [f for f in df.schema.fields if f.name not in cur_by_name]
        if not added and not widened:
            return df, None
        evolved = T.StructType(
            [
                T.StructField(f.name, widened.get(f.name, f.dataType), True)
                for f in current.fields
            ]
            + added
        )
        return df, evolved.simpleString()

    def read_incremental(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Rows ADDED in snapshots (from_version, to_version] — the
        incremental/CDC scan that lets a downstream pipeline process
        only what changed since its last run instead of re-reading the
        table (Iceberg's incremental append scan; changelog readers in
        Delta). File-granular: valid only over append-only ranges —
        data files are immutable, so appended files ARE the delta.
        Ranges containing rewriting commits (overwrite/delete/merge/
        replace/rollback) raise: their delta is row-level and needs a
        changelog materialization, not a file scan. `replace`
        (compaction) rewrites unchanged ROWS, so callers should consume
        deltas promptly or snapshot-pin before maintenance windows."""
        if to_version is None:
            to_version = self.log.latest_version()
        entries = [
            e for e in self.log.entries() if from_version < e.version <= to_version
        ]
        rewriting = [
            e.operation
            for e in entries
            if e.operation not in ("append", "create", "set_properties", "add_column", "stage")
        ]
        if rewriting:
            raise ValueError(
                f"incremental read over non-append operations {rewriting}: "
                "file-granular deltas are only sound for append-only ranges"
            )
        paths = [
            os.path.join(self.table_dir, fi.path)
            for e in entries
            if e.operation != "stage"  # staged files aren't on main yet
            for fi in e.added_files
        ]
        if not paths:
            return self.spark.createDataFrame([], self.schema(to_version) or self._schema())
        return self._read_paths(paths, version=to_version)

    def _schema(self) -> T.StructType:
        # empty table: recover schema from any file ever written, else empty
        for entry in self.log.entries():
            for fi in entry.added_files:
                return self.spark.read.parquet(os.path.join(self.table_dir, fi.path)).schema
        return T.StructType([])

    # ---- named refs (branches/tags; Nessie/Iceberg ref analog) -------

    def create_branch(self, name: str, at: int | None = None) -> dict:
        """Named movable pointer to a snapshot (default: current head) —
        the analog of Nessie's git-like branches (the reference pins
        `ref=main` in spark-defaults) and Iceberg's branch refs. A
        branch pins its snapshot against expire_snapshots; advance it
        with fast_forward, delete with drop_ref."""
        return self.log.create_ref(name, self._head_or(at), kind="branch")

    def create_tag(self, name: str, at: int | None = None) -> dict:
        """Immutable named pointer (Iceberg tag): same pinning as a
        branch, but can never be moved — audit/release markers."""
        return self.log.create_ref(name, self._head_or(at), kind="tag")

    def fast_forward(self, name: str, to: int | None = None) -> dict:
        """ADVANCE a branch pointer to `to` (default: current head).
        Strictly forward, as Iceberg's fast_forward procedure: moving a
        branch backwards would silently discard branch history — on
        this linear log, ancestor means smaller version."""
        target = self._head_or(to)
        current = self.log.resolve_ref(name)
        if target < current:
            raise ValueError(
                f"fast_forward {name!r}: target snapshot {target} is behind the "
                f"branch (at {current}) — not a fast-forward"
            )
        return self.log.update_ref(name, target)

    def drop_ref(self, name: str) -> None:
        self.log.delete_ref(name)

    def _head_or(self, at: int | None) -> int:
        if at is not None:
            return at
        head = self.log.latest_version()
        if head is None:
            raise ValueError("table has no snapshots")
        return head

    def refs(self) -> DataFrame:
        """The `<t>.refs` metadata relation (Iceberg's refs table)."""
        schema = T.StructType(
            [
                T.StructField("name", T.StringType(), False),
                T.StructField("type", T.StringType(), False),
                T.StructField("snapshot_id", T.LongType(), False),
            ]
        )
        rows = [
            (r["name"], r["kind"].upper(), r["snapshot_id"])
            for r in self.log.refs().values()
        ]
        return self.spark.createDataFrame(rows, schema)

    # ---- metadata views (SURVEY.md S2/S3) ----------------------------

    def snapshots(self) -> DataFrame:
        """The `<t>.snapshots` metadata relation (guide :132-134)."""
        rows = []
        for e in self.log.entries():
            st = self.log.state_at(e.version)
            rows.append(
                (
                    e.snapshot_id,
                    # naive UTC timestamp (session TZ is UTC)
                    _dt.datetime.fromtimestamp(e.committed_at, _dt.timezone.utc).replace(tzinfo=None),
                    e.operation,
                    len(e.added_files),
                    len(e.removed_files),
                    len(st),
                    sum(fi.row_count for fi in st.values()),
                )
            )
        return self.spark.createDataFrame(rows, SNAPSHOTS_SCHEMA)

    def files(self, version: int | None = None) -> DataFrame:
        """The `<t>.files` metadata relation (guide :175-185)."""
        rows = [
            (
                fi.content,
                os.path.join(self.table_dir, fi.path),
                fi.size_bytes,
                fi.row_count,
                (
                    {
                        c: [None if v is None else str(v) for v in bounds]
                        for c, bounds in fi.stats.items()
                    }
                    if fi.stats
                    else None
                ),
            )
            for fi in self.log.state_at(version).values()
        ]
        return self.spark.createDataFrame(rows, FILES_SCHEMA)

    # ---- writes ------------------------------------------------------

    def append(self, df: DataFrame, extra: dict | None = None) -> LogEntry:
        df, schema_ddl = self._align_for_write(df)
        merged = dict(extra or {})
        if schema_ddl:
            merged["schema"] = schema_ddl
        return self._commit_write(
            df,
            operation="append",
            removed=(),
            extra=merged or None,
        )

    def stage_append(self, df: DataFrame, wap_id: str) -> LogEntry:
        """Write-audit-publish staging (Iceberg's `spark.wap.id` flow):
        write the data files and commit a `stage` snapshot that the
        main lineage SKIPS — current reads see nothing until
        `publish_changes(wap_id)` replays its files as a real append.
        The staged snapshot is auditable the same way Iceberg's is: it
        appears in the `snapshots` view, and `read(version=<stage
        snapshot id>)` is the AUDIT read — main-as-of-then plus the
        staged files — so validation queries run against exactly what
        publishing would produce."""
        df, schema_ddl = self._align_for_write(df)
        if schema_ddl and self.schema() is not None:
            # a staged entry must not carry schema metadata: the log's
            # newest-schema-wins lookup would apply it to main BEFORE
            # the publish. Evolve the table first, then stage.
            raise ValueError(
                "staged write cannot evolve the table schema; "
                "run add_column / an evolving append first, then stage"
            )
        # wap_id is the publish handle — reuse would make publish_changes
        # ambiguous (it would have to pick one stage arbitrarily and
        # strand the other's files for the orphan sweep). Published ids
        # are rejected too: publish_changes refuses double-publish, so a
        # re-staged published id could never be published.
        for e in self.log.entries():
            if (e.extra or {}).get("wap_id") == wap_id and e.operation == "stage":
                raise ValueError(
                    f"wap_id {wap_id!r} already staged (snapshot "
                    f"{e.snapshot_id}); stage ids must be unique per table"
                )
        return self._commit_write(
            df, operation="stage", removed=(), extra={"wap_id": wap_id}
        )

    def overwrite(self, df: DataFrame) -> LogEntry:
        # overwrite replaces the data wholesale, so the write schema
        # BECOMES the table schema (no evolution constraints)
        removed = tuple(self.log.state_at().keys())
        cur = self.schema()
        ddl = df.schema.simpleString()
        return self._commit_write(
            df,
            operation="overwrite",
            removed=removed,
            extra={"schema": ddl} if cur is None or ddl != cur.simpleString() else None,
        )

    # ---- row-level operations (copy-on-write; Iceberg v2 analog) -----

    def _affected_files(self, match: DataFrame) -> list[str]:
        """Relative paths of live data files containing >=1 row of
        `match` (a filtered view of this table carrying a `__file`
        column from input_file_name, captured BEFORE any join — the
        function is per-source and can't be re-evaluated on a joined
        plan). Only these rewrite — at scale deleting 0.1% of rows
        touches 0.1%-ish of files, not the table."""
        prefix_len = len(os.path.abspath(self.table_dir)) + 1
        rows = match.select(F.col("__file").alias("src_file")).distinct().collect()
        rels = []
        for r in rows:
            p = r.src_file
            if p.startswith("file:"):
                p = p[len("file:") :]
                while p.startswith("//"):  # file:///abs -> /abs
                    p = p[1:]
            rels.append(os.path.abspath(p)[prefix_len:])
        return sorted(rels)

    def delete_where(self, condition) -> LogEntry:
        """Row-level DELETE ... WHERE, copy-on-write: files containing
        matches are rewritten without the matching rows; untouched files
        carry over. The reference's stack expresses the same operation
        as Iceberg v2 delete files (content classes 1/2,
        SPARK_ICEBERG_GUIDE.md:336-340) that readers must merge and
        `rewrite_position_deletes` (guide :17) later folds in; COW pays
        the fold immediately, so scans stay plain parquet reads and the
        rewrite procedures are structural no-ops."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        tagged = self.read().withColumn("__file", F.input_file_name())
        affected = self._affected_files(tagged.filter(cond))
        if not affected:  # nothing matched: no commit, table unchanged
            return self.log.read_entry(self.log.latest_version())
        paths = [os.path.join(self.table_dir, p) for p in affected]
        survivors = self._read_paths(paths).filter(~cond)
        # survivors are a subset of the affected files' rows, so the
        # logged byte total is a sound (upper-bound) size estimate:
        # skip the measure-then-shape staging write entirely
        return self._commit_write(
            survivors,
            operation="delete",
            removed=tuple(affected),
            input_bytes=self._logged_bytes(affected),
        )

    def update_where(self, assignments: dict[str, object], condition) -> LogEntry:
        """Row-level UPDATE ... SET ... WHERE, copy-on-write (the same
        file-granular rewrite as delete_where): only files containing a
        matching row are rewritten — matched rows get the assignments
        applied, unmatched rows in those files carry over verbatim, and
        untouched files stay referenced as-is. The reference's Iceberg
        stack expresses UPDATE as a delete-file + data-file pair
        (SPARK_ICEBERG_GUIDE.md:336-340); COW folds both immediately.

        `assignments` maps column name -> SQL expression string (or
        Column); expressions see the pre-update row, as SQL requires
        (`SET a = b, b = a` swaps)."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        schema = self.schema() or self._schema()
        known = {f.name for f in schema.fields}
        bad = sorted(set(assignments) - known)
        if bad:
            raise ValueError(f"UPDATE of unknown column(s) {bad}; table has {sorted(known)}")
        tagged = self.read().withColumn("__file", F.input_file_name())
        affected = self._affected_files(tagged.filter(cond))
        if not affected:  # nothing matched: no commit, table unchanged
            return self.log.read_entry(self.log.latest_version())
        paths = [os.path.join(self.table_dir, p) for p in affected]
        # single projection evaluated against the PRE-update row: every
        # assignment sees original values even when columns reference
        # each other, and each file's rows rewrite in one pass
        exprs = []
        for f in schema.fields:
            if f.name in assignments:
                a = assignments[f.name]
                new_val = F.expr(a) if isinstance(a, str) else a
                exprs.append(
                    F.when(cond, new_val.cast(f.dataType)).otherwise(F.col(f.name)).alias(f.name)
                )
            else:
                exprs.append(F.col(f.name))
        rewritten = self._read_paths(paths).select(*exprs)
        return self._commit_write(
            rewritten,
            operation="update",
            removed=tuple(affected),
            input_bytes=self._logged_bytes(affected),
        )

    def _logged_bytes(self, rel_paths) -> int:
        state = self.log.state_at()
        return sum(state[p].size_bytes for p in rel_paths if p in state)

    def merge(
        self, source: DataFrame, key_cols: list[str], extra: dict | None = None
    ) -> LogEntry:
        """MERGE (upsert, full-row): target rows whose key appears in
        `source` are replaced by the source row; unmatched source rows
        insert. Copy-on-write: only files containing a matched key
        rewrite (their unmatched rows carry over), plus one write of
        `source` itself. Keys are broadcast when small; the anti join
        runs only over the affected files' rows."""
        self._check_merge_cardinality(source, key_cols)
        state = self.log.state_at()
        if not state:
            return self.append(source, extra=extra)
        keys = source.select(*key_cols).distinct()
        tagged = self.read().withColumn("__file", F.input_file_name())
        matched = tagged.join(F.broadcast(keys), key_cols, "left_semi")
        affected = self._affected_files(matched)
        if affected:
            paths = [os.path.join(self.table_dir, p) for p in affected]
            # schema-aware read: pre-evolution files project added
            # columns as null, so carried rows union cleanly with source
            carried = self._read_paths(paths).join(F.broadcast(keys), key_cols, "left_anti")
            new_data = carried.unionByName(source)
        else:
            new_data = source
        return self._commit_write(
            new_data,
            operation="merge",
            removed=tuple(affected),
            input_bytes=self._merge_input_bytes(affected, source),
            extra=extra,
        )

    def _check_merge_cardinality(self, source: DataFrame, key_cols: list[str]) -> None:
        """SQL MERGE cardinality rule: a TARGET row may match at most
        ONE source row — duplicate source keys that hit the target
        would otherwise fan the matched row out (one output per match),
        silently duplicating data. Spark/Iceberg MERGE throw the same
        error. Duplicate keys that match nothing are legal (both rows
        simply insert), so the check is two stages: one tiny agg on the
        (small, upsert-side) source, and only if duplicates exist, a
        key-pruned target scan to see whether any duplicate actually
        matches."""
        dups = (
            source.groupBy(*key_cols).count().filter(F.col("count") > 1).drop("count")
        )
        if not dups.take(1):
            return
        if self.log.state_at():
            clash = (
                self.read()
                .select(*key_cols)
                .join(F.broadcast(dups), key_cols, "left_semi")
                .take(1)
            )
        else:
            clash = []
        if clash:
            key = {k: clash[0][k] for k in key_cols}
            raise ValueError(
                f"MERGE source has duplicate rows matching target key {key} — a "
                "target row may match at most one source row (SQL MERGE "
                "cardinality rule)"
            )

    def _merge_input_bytes(self, affected: list[str], source: DataFrame) -> int:
        """Output-size estimate for a merge-shaped commit: carried rows
        are bounded by the affected files' logged bytes; the source
        contributes ~rows x the table's logged bytes/row. One tiny count
        job on the (small, upsert-side) source replaces a full staged
        measurement write."""
        state = self.log.state_at()
        all_files = list(state.values())
        total_rows = sum(fi.row_count for fi in all_files)
        bpr = sum(fi.size_bytes for fi in all_files) / max(1, total_rows)
        return self._logged_bytes(affected) + int(source.count() * bpr) + 1

    def merge_when(
        self,
        source: DataFrame,
        key_cols: list[str],
        matched: list[tuple[str | None, str, dict[str, str] | None]],
        not_matched: tuple[str | None, dict[str, str] | None] | None,
        extra: dict | None = None,
    ) -> LogEntry:
        """General MERGE with per-clause semantics (Iceberg v2's
        row-level MERGE, the first DML past the runbook's upsert):

        - `matched`: ordered WHEN MATCHED clauses, each
          `(condition_sql | None, action, assignments)` where action is
          "update" (assignments: target col -> SQL expr) or "delete"
          (assignments None). SQL standard clause semantics: a matched
          row is handled by the FIRST clause whose condition holds;
          later clauses never see it. Expressions see the target row's
          columns by bare name and the source row's as `__src_<name>`
          (the SQL layer rewrites alias qualifiers into these).
        - `not_matched`: `(condition_sql | None, assignments | None)`
          for WHEN NOT MATCHED THEN INSERT; assignments None means
          INSERT * (source columns mapped to target columns by name,
          missing ones null). Expressions see source columns by bare
          name.

        Copy-on-write, same blast radius as merge(): only files holding
        a matched key rewrite; matched rows get their clause applied in
        ONE joined projection (update exprs see the pre-update row);
        unmatched rows in those files carry over; inserts append. The
        source side is broadcast — merges upsert small batches into big
        tables; a source rivaling the table in size should overwrite().
        """
        schema = self.schema() or self._schema()
        tcols = [f.name for f in schema.fields]
        known = set(tcols)
        for cond, action, assigns in matched:
            if action == "update":
                bad = sorted(set(assigns) - known)
                if bad:
                    raise ValueError(f"MERGE UPDATE of unknown column(s) {bad}")
        if not_matched is not None and not_matched[1] is not None:
            bad = sorted(set(not_matched[1]) - known)
            if bad:
                # silently ignoring a typo'd INSERT column would insert
                # NULL into the real column instead of raising
                raise ValueError(f"MERGE INSERT into unknown column(s) {bad}")
        if matched:
            # the cardinality rule protects target rows from being
            # updated/deleted twice; an insert-only MERGE modifies no
            # target row, so duplicate matched keys are simply ignored
            # rows (Spark/Iceberg behave the same way)
            self._check_merge_cardinality(source, key_cols)
        state = self.log.state_at()
        if not state:
            # empty table: every source row is NOT MATCHED
            if not_matched is None:
                return self.log.read_entry(self.log.latest_version())
            return self.append(self._insert_rows(source, schema, not_matched), extra=extra)

        affected: list[str] = []
        carried = None
        if matched:
            keys = source.select(*key_cols).distinct()
            tagged = self.read().withColumn("__file", F.input_file_name())
            affected = self._affected_files(
                tagged.join(F.broadcast(keys), key_cols, "left_semi")
            )
        if affected:
            paths = [os.path.join(self.table_dir, p) for p in affected]
            rows = self._read_paths(paths)
            src = source.select(
                *[F.col(c).alias(f"__src_{c}") for c in source.columns],
                F.lit(True).alias("__src_exists"),
            )
            j = rows.join(
                F.broadcast(src),
                # null-rejecting equality, as SQL `ON t.k = s.k` is: a
                # NULL key never matches (NOT eqNullSafe)
                on=[F.col(k) == F.col(f"__src_{k}") for k in key_cols],
                how="left",
            )
            is_matched = F.col("__src_exists").isNotNull()
            # first-matching-clause index (null = no clause applies).
            # Conditions go through coalesce(..., false): SQL's
            # three-valued logic says a NULL condition does NOT select
            # the clause — without the coalesce, one NULL would poison
            # `picked` (false OR null = null) and silently disable every
            # later clause for that row.
            clause = F.lit(None).cast("int")
            picked = F.lit(False)
            for i, (cond, _a, _s) in enumerate(matched):
                c = (
                    F.coalesce(F.expr(cond).cast("boolean"), F.lit(False))
                    if cond
                    else F.lit(True)
                )
                hit = is_matched & c & ~picked
                clause = F.when(hit, F.lit(i)).otherwise(clause)
                picked = picked | hit
            j = j.withColumn("__clause", clause)
            deletes = [i for i, (_c, a, _s) in enumerate(matched) if a == "delete"]
            if deletes:
                j = j.filter(
                    F.col("__clause").isNull() | ~F.col("__clause").isin(deletes)
                )
            exprs = []
            for f in schema.fields:
                e = F.col(f.name)
                for i, (_c, action, assigns) in enumerate(matched):
                    if action == "update" and f.name in assigns:
                        e = F.when(
                            F.col("__clause") == i,
                            F.expr(assigns[f.name]).cast(f.dataType),
                        ).otherwise(e)
                exprs.append(e.alias(f.name))
            carried = j.select(*exprs)

        new_data = carried
        if not_matched is not None:
            # truly-unmatched source rows: anti join against the FULL
            # target's keys (column-pruned scan — only key columns read)
            unmatched = source.join(
                self.read().select(*key_cols), key_cols, "left_anti"
            )
            ins = self._insert_rows(unmatched, schema, not_matched)
            new_data = carried.unionByName(ins) if carried is not None else ins

        if new_data is None:  # matched clauses only, nothing matched
            return self.log.read_entry(self.log.latest_version())
        return self._commit_write(
            new_data,
            operation="merge",
            removed=tuple(affected),
            input_bytes=self._merge_input_bytes(affected, source),
            extra=extra,
        )

    @staticmethod
    def _insert_rows(
        unmatched: DataFrame,
        schema: T.StructType,
        not_matched: tuple[str | None, dict[str, str] | None],
    ) -> DataFrame:
        cond, assigns = not_matched
        if cond:
            unmatched = unmatched.filter(F.expr(cond))
        if assigns is None:  # INSERT *: map source -> target by name
            return unmatched.select(
                *[
                    (
                        F.col(f.name) if f.name in unmatched.columns else F.lit(None)
                    ).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ]
            )
        return unmatched.select(
            *[
                (
                    F.expr(assigns[f.name]) if f.name in assigns else F.lit(None)
                ).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )

    def _commit_write(
        self,
        df: DataFrame,
        operation: str,
        removed: tuple[str, ...],
        input_bytes: int | None = None,
        extra: dict | None = None,
    ) -> LogEntry:
        files = self._write_files(df, input_bytes=input_bytes)

        def make(version: int) -> LogEntry:
            # Iceberg-style commit validation: `removed` was planned
            # against the state BEFORE this commit loop; if a racing
            # commit (compaction replace, another delete) already
            # removed any of those files, committing stale removals
            # would resurrect/duplicate rows. make() re-runs on every
            # optimistic retry, so this check always sees the state the
            # commit will actually apply to.
            if removed:
                live = self.log.state_at()
                gone = [p for p in removed if p not in live]
                if gone:
                    raise CommitConflictError(
                        f"{operation} on {self.identifier}: {len(gone)} planned "
                        f"removed file(s) no longer live (e.g. {gone[0]!r}) — a "
                        "concurrent commit replaced them; re-plan from the new state"
                    )
            return LogEntry(
                version=version,
                snapshot_id=version,
                committed_at=time.time(),
                operation=operation,
                added_files=files,
                removed_files=removed,
                extra=extra,
            )

        return self.log.append(make)

    def _write_files(
        self, df: DataFrame, input_bytes: int | None = None, shaped: bool = False
    ) -> tuple[FileInfo, ...]:
        """Write df as parquet honoring `write.target-file-size-bytes`
        and `write.distribution-mode` (guide :108-109, :324-328).
        Files land in a unique per-commit subdir (no renames; uncommitted
        dirs are what `remove_orphan_files` sweeps).

        Sizing semantics match Iceberg's rolling writers: the target is
        a per-file CAP, not a bin-packing goal — an append never
        coalesces below the input's natural partitioning (tiny inserts
        produce tiny files; that small-file problem is precisely what
        `rewrite_data_files` exists to fix, guide :142-163 vs :228-240).
        We measure-then-shape: write naturally, and only if measured
        compressed bytes say files exceed the cap, split by rewriting at
        ceil(total/target). Catalyst's plan-size estimate is useless for
        this (literal/unknown plans report 8 EiB). Compaction passes
        exact logged bytes and skips staging entirely.
        """
        props = self.log.properties_at()
        target = int(props.get(PROP_TARGET_FILE_SIZE, DEFAULT_TARGET_FILE_SIZE))
        mode = props.get(PROP_DISTRIBUTION_MODE, "none")
        hash_cols = [c.strip() for c in props.get(PROP_HASH_COLUMNS, "").split(",") if c.strip()]

        def shape(frame: DataFrame, n: int) -> DataFrame:
            # always a repartition, never coalesce(1): coalesce pushes
            # the single-partition constraint up through the whole input
            # plan, serializing broadcast-join stages (measured 3.1 s vs
            # 0.66 s for an 18-row merge output at sf0.1); adjacent
            # repartitions (compaction pre-shapes its read) collapse
            # into one shuffle via Catalyst's CollapseRepartition
            if mode == "hash":
                cols = hash_cols or frame.columns[:1]
                return frame.repartition(n, *[F.col(c) for c in cols])
            return frame.repartition(n)

        def write_dir(frame: DataFrame) -> str:
            out = os.path.join(self.data_dir, f"v{uuid.uuid4().hex[:12]}")
            frame.write.mode("error").parquet(out)
            return out

        def scan(out_dir: str) -> tuple[FileInfo, ...]:
            infos = []
            for name in self.io.listdir(out_dir):
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(out_dir, name)
                rel = os.path.relpath(full, self.table_dir)
                # exact row count + column min/max/null-count metrics
                # from one parquet footer read — no Spark job; these are
                # what scan planning prunes against (Iceberg manifests
                # record the same metrics at write time)
                rows, stats = self.io.parquet_file_stats(full)
                infos.append(
                    FileInfo(
                        path=rel,
                        size_bytes=self.io.size(full),
                        row_count=rows,
                        stats=stats or None,
                    )
                )
            return tuple(infos)

        if shaped:
            # caller already partitioned/sorted the frame (e.g. sort-
            # strategy compaction via repartitionByRange): re-shaping
            # here would collapse the caller's clustering back into a
            # round-robin shuffle, so write it as-is
            return scan(write_dir(df))

        if input_bytes is not None:
            n_files = max(1, math.ceil(input_bytes / target))
            return scan(write_dir(shape(df, n_files)))

        # hash mode pre-shuffles the staged write too so even the
        # measurement pass is clustered; partition count comes from the
        # scheduler's parallelism — df.rdd.getNumPartitions() would
        # force an RDD conversion (plan compilation + codegen barrier)
        # just to count partitions
        n_staged = self.spark.sparkContext.defaultParallelism
        staged_dir = write_dir(df if mode != "hash" else shape(df, n_staged))
        staged = scan(staged_dir)
        total = sum(fi.size_bytes for fi in staged)
        n_split = math.ceil(total / target)
        if n_split <= len(staged):
            return staged  # every file is at/under the cap (modulo skew)
        reshaped = shape(self.spark.read.parquet(staged_dir), n_split)
        final = scan(write_dir(reshaped))
        self.io.rmtree(staged_dir)
        return final
