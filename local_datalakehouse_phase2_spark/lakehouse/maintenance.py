"""Maintenance procedures — the reference's core domain (SURVEY.md §2.10).

Each maps one `CALL nessie.system.<proc>(...)` from the runbook onto a
plain PySpark job + transaction-log commit:

- M1 rewrite_data_files    /root/reference/SPARK_ICEBERG_GUIDE.md:228-240
- M2 rewrite_manifests     :243-248  (= log checkpointing here)
- M3 expire_snapshots      :253-268  (retain_last / older_than, UTC)
- M4 remove_orphan_files   :272-280  (>= 24 h safety floor at :274)
- M5 rollback_to_snapshot  :304-316
- M6 rewrite_position_deletes / rewrite_equality_deletes (:17): the
  merge-on-read fold-back procedures for content=1/2 delete files
  (guide :336-340) — drop dangling tombstones, compact delete files,
  and (for equality deletes) rewrite the affected data files so the
  read path sheds its anti-joins.

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

import json
import math
import os
import time
import uuid
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import replace as _dc_replace

from ..localrows import local_df
from .log import CommitConflictError, FileInfo, LogEntry
from .table import (
    DEFAULT_TARGET_FILE_SIZE,
    POS_DELETE_SCHEMA,
    PROP_GC_ENABLED,
    LakehouseTable,
    _parse_ddl_cached,
)

ORPHAN_SAFETY_SECONDS = 24 * 3600  # guide :274
# future-stamped commits beyond this prove writer/sweeper clock skew
CLOCK_SKEW_TOLERANCE_SECONDS = 300.0


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
        elif t == "string":
            # Lexicographic 6-byte prefix as a number (2^48 < 2^53, so
            # double-exact): space-padded to fixed width so shorter
            # strings order below longer extensions — the same
            # truncate-to-bytes idea as Iceberg's zorder on strings.
            # Clustering quality, not correctness, depends on this (the
            # residual predicate always re-filters), so the space-pad
            # approximation for sub-space characters is acceptable.
            e = F.expr(
                f"conv(hex(rpad(substring(`{c}`, 1, 6), 6, ' ')), 16, 10)"
            ).cast("double")
        else:
            raise MaintenanceError(
                f"zorder column {c!r} has unsupported type {t} "
                "(numeric/date/timestamp/string only)"
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


# Iceberg BinPackStrategy defaults: files inside the
# [MIN_FILE_SIZE_DEFAULT_RATIO, MAX_FILE_SIZE_DEFAULT_RATIO] band
# around the target are "well sized" and never rewritten.
_MIN_FILE_SIZE_RATIO = 0.75
_MAX_FILE_SIZE_RATIO = 1.80
DEFAULT_MAX_FILE_GROUP_SIZE = 100 * 1024 * 1024 * 1024  # Iceberg's 100 GB


def _plan_file_groups(
    candidates: list[tuple[str, FileInfo]],
    max_group_bytes: int,
    min_input_files: int,
    max_file_size_bytes: int,
    force_paths: frozenset[str] = frozenset(),
) -> list[list[tuple[str, FileInfo]]]:
    """Bin-pack candidate files into rewrite groups of ~max_group_bytes.

    A group is the unit of rewrite AND (under partial progress) of
    commit — Iceberg's file group. Eligibility per group:
    - >= min_input_files files AND more than one file (rewriting 1
      small file into 1 small file burns a full read+write for zero
      benefit — this is what makes compaction idempotent: the one
      well-under-target file a binpack produces is alone in its group
      and never rewritten again), OR
    - ANY file over max_file_size_bytes — oversized files must split
      regardless of the min-input-files gate (Iceberg's BinPack
      rewrites oversized files unconditionally; a lone 10 GB file on a
      min-input-files=5 table would otherwise never shrink), OR
    - ANY file in `force_paths` — files with attached merge-on-read
      delete files (the delete-file-threshold rule): rewriting one file
      into one file is NOT a no-op when it folds tombstones away.
    """
    groups = _band_groups(sorted(candidates), max_group_bytes)  # deterministic
    return [
        g
        for g in groups
        if (len(g) >= min_input_files and len(g) > 1)
        or any(fi.size_bytes > max_file_size_bytes for _, fi in g)
        or any(p in force_paths for p, _ in g)
    ]


def _band_groups(
    ordered: list[tuple[str, FileInfo]], max_group_bytes: int
) -> list[list[tuple[str, FileInfo]]]:
    """Greedy-pack `ordered` files into bins of ~max_group_bytes,
    PRESERVING input order — so a caller that pre-orders candidates by
    key range (clustered compaction) gets groups holding adjacent
    ranges, and sorting within each group approximates a global sort."""
    groups: list[list[tuple[str, FileInfo]]] = []
    cur: list[tuple[str, FileInfo]] = []
    cur_bytes = 0
    for p, fi in ordered:
        if cur and cur_bytes + fi.size_bytes > max_group_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append((p, fi))
        cur_bytes += fi.size_bytes
    if cur:
        groups.append(cur)
    return groups


def rewrite_data_files(
    table: LakehouseTable,
    target_file_size_bytes: int = DEFAULT_TARGET_FILE_SIZE,
    min_input_files: int = 1,
    strategy: str = "binpack",
    sort_order: str | None = None,
    min_file_size_bytes: int | None = None,
    max_file_size_bytes: int | None = None,
    max_file_group_size_bytes: int = DEFAULT_MAX_FILE_GROUP_SIZE,
    max_concurrent_file_group_rewrites: int = 1,
    partial_progress_enabled: bool = False,
    delete_file_threshold: int = 1,
    ref: str | None = None,
) -> dict:
    """M1: compact data files into ~target-size files, by file group.

    `ref` scopes the compaction to a BRANCH lineage (Iceberg's
    maintenance-on-a-ref): candidates select from the branch's live
    state (fork base + chain), each group reads with the branch's
    delete files applied, and the replace commits ONTO the branch —
    main stays byte-identical. The merge's net-effect fold then treats
    the rewrite as branch-internal churn (files added-then-replaced on
    the branch cancel), so compact-then-merge equals merge-then-compact
    row-for-row; the orphan sweep already protects every branch-tagged
    entry's files. Post-compaction delete-file cleanup
    (rewrite_position_deletes / stale-eq-delete drop) runs only on
    main — branch MOR cleanup folds in naturally when the branch
    merges and main maintenance runs. Branch-chain entries superseded
    by the rewrite stay expiry-protected until merge/drop releases
    them (expire_snapshots keeps live chains whole).

    Mirrors `CALL rewrite_data_files(table, strategy => ..., sort_order
    => ..., options => map('target-file-size-bytes','134217728',
    'min-input-files','1','max-concurrent-file-group-rewrites','4',
    'partial-progress.enabled','true'))` — the runbook's central
    maintenance CALL (guide :228-240) with Iceberg's BinPackStrategy
    semantics:

    - **Selection**: only files OUTSIDE the well-sized band
      [0.75x, 1.8x] of the target are rewrite candidates. Re-running
      compaction on an already-compacted table rewrites nothing — at
      100 TB this is the difference between touching the 1% of files a
      recent ingest fragmented and rewriting the whole table.
    - **File groups**: candidates bin-pack into groups of
      `max_file_group_size_bytes` (Iceberg default 100 GB); each group
      is an independent rewrite job — a bounded unit of work and of
      commit-conflict blast radius.
    - **Concurrency**: up to `max_concurrent_file_group_rewrites`
      group rewrites run at once (thread-pooled job submission; Spark
      schedules concurrent jobs across executors).
    - **partial_progress_enabled=True**: each group commits as it
      finishes, through the same conflict-validated optimistic retry as
      every commit. A racing delete aborts only THAT group — earlier
      group commits stand, and the failed group's files are swept up by
      the next run. False (default): all groups stage first, then one
      atomic `replace` commit swaps everything (a conflict anywhere
      aborts the whole rewrite, Iceberg's default behavior).

    Strategies:

    - binpack (default): plain repartition — cheapest, one round-robin
      shuffle per group. Only files outside the well-sized band are
      candidates.
    - sort: range-repartition + in-partition sort on `sort_order`
      columns, so files hold disjoint key ranges and parquet min/max
      footers make selective scans skip whole files/row groups.
    - zorder: interleave the bits of all `sort_order` columns into one
      Z-value and range-cluster on THAT (Iceberg/Delta OPTIMIZE
      ZORDER): predicates on ANY listed column prune, where `sort`
      only prunes on the leading column. Same single shuffle plus one
      tiny min/max agg for normalization bounds.

    Clustered strategies rewrite EVERY data file (clustering is the
    point, not sizing — Iceberg's sort strategy with rewrite-all), but
    NOT as one whole-table group: candidates are ordered by the
    leading sort column's logged min (so groups hold adjacent key
    ranges) and banded into `max_file_group_size_bytes` groups, each
    an independent bounded rewrite/commit — at 100 TB a sort rewrite
    is a sequence of 100 GB commits with partial progress, not one
    table-sized transaction. Cross-group key overlap is possible at
    band edges; scan pruning stays correct (it is advisory-only) and
    clustering quality converges on re-runs because group order
    follows the previous pass's ranges.

    Merge-on-read interplay: each group is read with the table's live
    delete files APPLIED (content=1/2, guide :336-340), so compaction
    folds tombstones into the rewritten files; afterwards the
    now-dangling delete entries are dropped via
    rewrite_position_deletes and provably-stale equality-delete files
    are removed. `delete_file_threshold` (Iceberg's
    `delete-file-threshold` option) makes any data file referenced by
    >= that many live delete files a candidate regardless of its size —
    without it, a well-sized or lone-in-partition file with tombstones
    attached would never fold them and every read would pay the
    anti-join forever. Default 1: compaction always clears tombstones
    it can reach. A delete committed between planning and a group's
    commit raises a conflict for that group (delete-set fingerprint
    check) instead of silently resurrecting rows.
    """
    if strategy not in ("binpack", "sort", "zorder"):
        raise MaintenanceError(f"rewrite_data_files: unknown strategy {strategy!r}")
    if strategy in ("sort", "zorder") and not sort_order:
        raise MaintenanceError(f"rewrite_data_files: {strategy} strategy requires sort_order")
    if max_concurrent_file_group_rewrites < 1:
        raise MaintenanceError("max-concurrent-file-group-rewrites must be >= 1")
    target = target_file_size_bytes
    min_sz = int(target * _MIN_FILE_SIZE_RATIO) if min_file_size_bytes is None else min_file_size_bytes
    max_sz = int(target * _MAX_FILE_SIZE_RATIO) if max_file_size_bytes is None else max_file_size_bytes
    state = (
        table.log.state_at_branch(ref) if ref is not None else table.log.state_at()
    )
    data_state = {p: fi for p, fi in state.items() if fi.content == 0}
    deletes_fp = tuple(sorted(p for p, fi in state.items() if fi.content != 0))

    # Iceberg's delete-file-threshold: a data file referenced by >=
    # threshold live delete files is a rewrite candidate REGARDLESS of
    # its size — well-sized or lone-in-partition files with tombstones
    # attached would otherwise never fold them (every read pays the
    # anti-join forever). Metadata-only: the same may-reference tests
    # the read path uses for delete scoping.
    pos_files = [fi for fi in state.values() if fi.content == 1]
    eq_files = [fi for fi in state.values() if fi.content == 2]
    forced: frozenset[str] = frozenset()
    if pos_files or eq_files:
        # per-data-file count of may-reference delete files. Pos files
        # count via an interval sweep over the sorted paths (their
        # footer file_path bounds are ranges) — O((F+D) log F), the
        # same scoping index the read path uses; eq files stay a pair
        # loop (few by construction, and their test is per-column).
        import bisect as _b

        sorted_paths = sorted(data_state)
        diff = [0] * (len(sorted_paths) + 1)
        for d in pos_files:
            s = (d.stats or {}).get("file_path")
            if not s or s[0] is None or s[1] is None:
                lo, hi = 0, len(sorted_paths)
            else:
                lo = _b.bisect_left(sorted_paths, s[0])
                hi = _b.bisect_right(sorted_paths, s[1])
            diff[lo] += 1
            diff[hi] -= 1
        counts: dict[str, int] = {}
        acc = 0
        for i, p in enumerate(sorted_paths):
            acc += diff[i]
            counts[p] = acc
        for p, fi in data_state.items():
            if counts[p] < delete_file_threshold and eq_files:
                counts[p] += sum(
                    1 for d in eq_files if table._eq_delete_may_apply(fi, d)
                )
        forced = frozenset(
            p for p, c in counts.items() if c >= delete_file_threshold
        )

    # Layout migration: on a partitioned table, any live data file NOT
    # laid out under the CURRENT spec (pre-spec, adopted via add_files,
    # or written before spec evolution) is a forced candidate — like
    # the delete-file threshold, rewriting 1 file into 1 file is NOT a
    # no-op when it moves the file into the current partition layout.
    # Without this, a lone old-spec file per partition never groups
    # (the >1-file idempotency gate) and the table is permanently
    # stuck: overwrite_partitions demands migration, compaction
    # refuses to perform it. Still idempotent: once migrated, the file
    # carries every current pname and is never forced again.
    cur_spec = table.partition_spec()
    if cur_spec:
        forced = forced | frozenset(
            p
            for p, fi in data_state.items()
            if any(t.pname not in (fi.partition or {}) for t in cur_spec)
        )

    # Iceberg plans rewrites PER PARTITION: a file group never mixes
    # partitions, so rewritten files keep their partition dirs and a
    # conflict in one partition's group can't touch another's
    def part_key(fi: FileInfo):
        return tuple(sorted((fi.partition or {}).items()))

    by_part: dict[tuple, list[tuple[str, FileInfo]]] = {}
    for p, fi in data_state.items():
        by_part.setdefault(part_key(fi), []).append((p, fi))

    groups = []
    if strategy in ("sort", "zorder"):
        # clustered: all data files, banded into bounded groups ordered
        # by the leading sort column's logged min so each group covers
        # an adjacent key range (within its partition)
        lead = [c.strip() for c in sort_order.split(",") if c.strip()][0]

        def order_key(item):
            p, fi = item
            s = (fi.stats or {}).get(lead)
            mn = s[0] if s and s[0] is not None else None
            return (mn is None, mn if mn is not None else "", p)

        if len(data_state) >= max(1, min_input_files):
            for key in sorted(by_part):
                ordered = sorted(by_part[key], key=order_key)
                groups.extend(_band_groups(ordered, max_file_group_size_bytes))
    else:
        for key in sorted(by_part):
            candidates = [
                (p, fi)
                for p, fi in by_part[key]
                if fi.size_bytes < min_sz or fi.size_bytes > max_sz or p in forced
            ]
            groups.extend(
                _plan_file_groups(
                    candidates,
                    max_file_group_size_bytes,
                    min_input_files,
                    max_sz,
                    force_paths=forced,
                )
            )
    if not groups:
        return {
            "rewritten_files": 0,
            "added_files": 0,
            "file_groups": 0,
            "failed_groups": 0,
            "folded_delete_files": 0,
            "skipped": True,
        }

    def rewrite_group(group: list[tuple[str, FileInfo]]) -> tuple:
        """Read ONLY the group's files, reshape to ~target-size output.
        Returns (group_paths, written FileInfos).

        Output-count choice must CONVERGE: an even split into
        ceil(gbytes/target) files can land every output below the
        0.75x band (e.g. 1.4x target -> two 0.7x files), which the next
        run would re-select forever. Prefer ceil when its per-file size
        stays in-band; otherwise fall back to floor (fewer, larger
        files up to the 1.8x max) so the rewrite's own output is never
        a rewrite candidate."""
        gbytes = sum(fi.size_bytes for _, fi in group)
        n_ceil = max(1, math.ceil(gbytes / target))
        n_floor = max(1, math.floor(gbytes / target))
        if n_floor == n_ceil or gbytes / n_ceil >= min_sz:
            n_out = n_ceil
        elif gbytes / n_floor <= max_sz:
            n_out = n_floor
        else:
            n_out = n_ceil
        # deletes-applied read: merge-on-read tombstones fold into the
        # rewritten output instead of resurrecting (guide :336-340)
        df = table._read_rel([p for p, _ in group], ref=ref)
        if strategy == "sort":
            cols = [c.strip() for c in sort_order.split(",") if c.strip()]
            pre = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
        elif strategy == "zorder":
            cols = [c.strip() for c in sort_order.split(",") if c.strip()]
            z = _zvalue_column(df, cols)
            pre = (
                df.withColumn("__z", z)
                .repartitionByRange(n_out, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            pre = df.repartition(n_out)
        return [p for p, _ in group], table._write_files(pre, shaped=True)

    def commit_replace(removed_paths: list[str], added) -> None:
        def make(version: int) -> LogEntry:
            # commit validation (re-runs on each optimistic retry): the
            # compacted output replaces exactly the files it read; if a
            # racing commit already removed any of them, replacing would
            # resurrect rows that commit deleted. Ref mode validates
            # against the BRANCH's live state — that is the lineage the
            # replace commits onto.
            live = (
                table.log.state_at_branch(ref)
                if ref is not None
                else table.log.state_at()
            )
            gone = [p for p in removed_paths if p not in live]
            if gone:
                raise CommitConflictError(
                    f"rewrite_data_files on {table.identifier}: {len(gone)} input "
                    f"file(s) no longer live (e.g. {gone[0]!r}) — re-plan compaction"
                )
            if ref is None:
                # files a staged-undecided txn removes are off limits:
                # replacing one while the marker flips duplicates rows
                # (table._check_pending_txn_claims rationale)
                table._check_pending_txn_claims("rewrite_data_files", removed_paths)
            # the group was read with the PLAN-time delete files applied;
            # a delete file added (or removed) since would make the
            # rewritten rows wrong — Iceberg's rewrite validates new
            # delete files the same way
            now_deletes = tuple(sorted(p for p, fi in live.items() if fi.content != 0))
            if now_deletes != deletes_fp:
                raise CommitConflictError(
                    f"rewrite_data_files on {table.identifier}: delete files "
                    "changed since planning (concurrent merge-on-read DELETE?) — "
                    "re-plan compaction"
                )
            return LogEntry(
                version=version,
                snapshot_id=version,
                committed_at=time.time(),
                operation="replace",
                # rewritten files get THIS commit's sequence number:
                # deletes live at plan time are already folded in, and
                # any equality delete committed later has a higher seq
                # so it still applies
                added_files=tuple(_dc_replace(fi, seq=version, name_epoch=version) for fi in added),
                removed_files=tuple(removed_paths),
            )

        table.log.append(make, branch=ref)

    def drop_written(added) -> None:
        # best-effort cleanup of a failed group's staged output; anything
        # missed is exactly what remove_orphan_files sweeps
        for fi in added:
            full = os.path.join(table.table_dir, fi.path)
            try:
                if table.io.exists(full):
                    table.io.remove(full)
            except OSError:
                pass

    rewritten = added_total = failed = 0
    pool = ThreadPoolExecutor(max_workers=max_concurrent_file_group_rewrites)
    try:
        # both modes drain EVERY future before returning/raising: a
        # straggler group finishing after an early exit would write
        # staged files nobody tracks, leaking them until the 24h
        # orphan sweep
        futures = [pool.submit(rewrite_group, g) for g in groups]
        if partial_progress_enabled:
            # commit each group as its rewrite lands (completion order,
            # not submission order — a slow group must not delay the
            # commits of groups that already finished); a conflict
            # loses only that group. A group whose REWRITE fails (Spark
            # error, not a commit race) is counted failed too; the
            # other groups still commit — that is partial progress —
            # and the first such error re-raises after the sweep so
            # the caller sees it, with committed groups standing.
            rewrite_error: BaseException | None = None
            for fut in as_completed(futures):
                try:
                    removed_paths, files = fut.result()
                except BaseException as exc:  # group rewrite itself failed
                    failed += 1
                    rewrite_error = rewrite_error or exc
                    continue
                try:
                    commit_replace(removed_paths, files)
                    rewritten += len(removed_paths)
                    added_total += len(files)
                except CommitConflictError:
                    failed += 1
                    drop_written(files)
            if rewrite_error is not None:
                raise rewrite_error
        else:
            # stage every group, then one atomic commit for all of them;
            # on ANY failure — commit conflict or a group's rewrite
            # error — drop the staged outputs instead of leaving up to
            # a full table's worth of bytes for the 24h orphan sweep
            all_removed: list[str] = []
            all_added: list = []
            stage_error: BaseException | None = None
            for fut in as_completed(futures):
                try:
                    removed_paths, files = fut.result()
                except BaseException as exc:
                    stage_error = stage_error or exc
                    continue
                all_removed.extend(removed_paths)
                all_added.extend(files)
            if stage_error is not None:
                drop_written(all_added)
                raise stage_error
            try:
                commit_replace(all_removed, tuple(all_added))
            except CommitConflictError:
                drop_written(all_added)
                raise
            rewritten = len(all_removed)
            added_total = len(all_added)
    finally:
        pool.shutdown(wait=False)
    folded_deletes = 0
    if deletes_fp and rewritten and ref is None:
        # the rewrite folded tombstones into its output: drop the
        # now-dangling position-delete entries and any equality-delete
        # file that provably no longer applies to a live data file.
        # A conflict here (racing writer) leaves the tombstones for the
        # next maintenance run — the compaction itself already stands.
        try:
            folded_deletes += rewrite_position_deletes(table)["removed_delete_files"]
            folded_deletes += _drop_stale_eq_deletes(table)
        except CommitConflictError:
            pass
    return {
        "rewritten_files": rewritten,
        "added_files": added_total,
        "file_groups": len(groups),
        "failed_groups": failed,
        "folded_delete_files": folded_deletes,
        "skipped": False,
    }


def rewrite_manifests(table: LakehouseTable) -> dict:
    """M2: compact commit metadata — write a resolved checkpoint so
    readers replay O(1) entries instead of the whole log (guide :243-248)."""
    v = table.log.write_checkpoint()
    return {"checkpoint_version": v}


def _catalog_ref_pins(table: LakehouseTable) -> set[int]:
    """Versions of `table` pinned by catalog-wide branch records
    (<warehouse>/.catalog_refs/*.json, see catalog_refs.py). The
    warehouse root is two levels above the table dir, the same
    derivation the log uses for `.txns` markers."""
    refs_dir = os.path.normpath(
        os.path.join(table.table_dir, os.pardir, os.pardir, ".catalog_refs")
    )
    pins: set[int] = set()
    try:
        names = table.io.listdir(refs_dir)
    except OSError:
        return pins
    for fname in names:
        if not fname.endswith(".json"):
            continue
        try:
            rec = json.loads(table.io.read_text(os.path.join(refs_dir, fname)))
        except (OSError, ValueError):
            continue  # torn/mid-write record: skip, never block expiry
        pin = (rec.get("pins") or {}).get(table.identifier)
        if pin is not None:
            pins.add(int(pin))
    return pins


def expire_snapshots(
    table: LakehouseTable,
    retain_last: int | None = None,
    older_than: float | None = None,
) -> dict:
    """M3: drop old snapshots and delete data files only they reference
    (guide :253-268). The CURRENT snapshot is always retained — after a
    rollback, "current" is the new head commit, so a rollback target can
    never be expired out from under it. Snapshots pointed at by a named
    branch/tag ref are likewise always retained (Iceberg's expiry
    honors refs the same way): a ref whose snapshot expired would be a
    dangling pointer.
    """
    _check_gc_enabled(table, "expire_snapshots")
    entries = table.log.entries()
    if not entries:
        return {"expired_snapshots": 0, "deleted_files": 0}
    versions = [e.version for e in entries]
    # "current" = the newest MAIN-lineage snapshot (the raw newest
    # entry can be a branch commit or an aborted txn entry). The raw
    # newest entry is ALSO always kept: removing it would rewind
    # latest_version and the next commit would REUSE its version
    # number — stale ref targets, cache keys, and file-dir names would
    # silently alias across incarnations.
    current = table.log.latest_main_version()

    keep = {versions[-1]}
    if current is not None:
        keep.add(current)
    keep.update(r["snapshot_id"] for r in table.log.refs().values())
    # a live BRANCH pins its whole replay lineage, not just its head:
    # state_at_branch folds main-at-base plus every chain commit, so
    # expiring the fork base or an intermediate branch commit would
    # silently drop its effect from (or break) every branch read and
    # the eventual merge
    for r in table.log.refs().values():
        if r.get("kind") == "branch":
            keep.add(r.get("base", r["snapshot_id"]))
            keep.update(r.get("commits", []))
    # unpublished write-audit-publish stage snapshots must survive:
    # expiring one would break its pending publish_changes AND strip
    # its files of orphan-sweep protection (data loss, not cleanup)
    published = {
        (e.extra or {}).get("published_wap")
        for e in entries
        if e.extra and e.extra.get("published_wap")
    }
    keep.update(
        e.version
        for e in entries
        if e.operation == "stage" and (e.extra or {}).get("wap_id") not in published
    )
    # CATALOG-wide refs (catalog_refs.py) pin an UNTOUCHED table by
    # VERSION in the warehouse record, not via a per-table ref — the
    # per-table branch is created lazily on first write. Those fork
    # pins must survive expiry exactly like ref targets, or a catalog
    # branch's read of a table it never wrote dangles after main
    # churns past retain_last. (Touched tables are already safe: their
    # lazily-forked branch pins base + chain through the ref rules
    # above.) Same cross-layer read as txn markers (log.txn_dir).
    keep.update(_catalog_ref_pins(table))
    # PENDING multi-table-transaction entries may still commit and
    # retro-apply — expiring one would tear the transaction apart
    # (committed ones are ordinary main commits, aborted ones are
    # reclaimable garbage). Everything AT OR ABOVE the earliest pending
    # entry is kept too: write_checkpoint clamps below pending entries
    # (a checkpoint must not freeze a pending txn out of the fold), so
    # a gap checkpoint protecting a kept version above the pending
    # entry would silently land BELOW it — and the expired entries in
    # between would vanish from every later fold (data loss, not
    # cleanup). Pending txns are short-lived; their window pins the
    # tail of the log until they decide.
    pending = [
        e.version
        for e in entries
        if (e.extra or {}).get("txn")
        and table.log.txn_status(e.extra["txn"]) == "pending"
    ]
    if pending:
        keep.update(v for v in versions if v >= min(pending))
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

    # Checkpoint BEFORE dropping entries so replay never needs them.
    # Ref- and stage-pinned snapshots make the kept set non-contiguous,
    # and a state fold across a GAP (kept version whose predecessors
    # were expired) would silently lose the expired commits' effects —
    # so every kept version that follows a gap gets its own resolved
    # checkpoint (metadata-sized; Iceberg's expiry rewrites manifests
    # for the same reason).
    kept_sorted = sorted(keep)
    expired_set = set(expired)
    for i, v in enumerate(kept_sorted):
        lo = kept_sorted[i - 1] if i else -1
        if any(lo < e < v for e in expired_set):
            table.log.write_checkpoint(v)
    table.log.remove_entries(expired)
    deleted = 0
    for rel in doomed:
        full = os.path.join(table.table_dir, rel)
        if table.io.exists(full):
            table.io.remove(full)
            deleted += 1
    # the deleted paths must leave the cumulative orphan-protection set
    # (r16) or the carried-forward `referenced` field would shield them
    # forever. Runs AFTER the deletes: a crash above leaves the paths
    # protected (a leak, reclaimed by remove_orphan_files(full_scan=
    # True)), never a window where a still-reachable file is sweepable.
    table.log.subtract_referenced(doomed)
    return {"expired_snapshots": len(expired), "deleted_files": deleted}


def remove_orphan_files(
    table: LakehouseTable,
    older_than: float | None = None,
    full_scan: bool = False,
) -> dict:
    """M4: delete files under the table dir referenced by NO snapshot
    (guide :272-280). Refuses cutoffs younger than 24 h (:274) — files
    may belong to an in-flight commit.

    `full_scan=True` recomputes the protection set from every surviving
    version instead of the newest checkpoint's cumulative `referenced`
    field (the r16 O(suffix) fast path), and refreshes that field with
    the result — the recovery lever for the one leak the fast path
    admits: an expire_snapshots that crashed between dropping entries
    and deleting/unprotecting the doomed files leaves those paths in
    `referenced` (protected, never reclaimed) until a full scan prunes
    the set.
    """
    _check_gc_enabled(table, "remove_orphan_files")
    now = time.time()
    if older_than is None:
        older_than = now - ORPHAN_SAFETY_SECONDS
    if older_than > now - ORPHAN_SAFETY_SECONDS:
        raise MaintenanceError(
            "remove_orphan_files: older_than must be >= 24h in the past (guide :274)"
        )
    # Clock-skew tripwire (r14): the 24h safety window assumes writer
    # and sweeper clocks agree to well under 24h — a writer whose clock
    # runs BEHIND the sweeper's by more than the window makes its
    # freshly staged files (pyarrow fast-path commits included, which
    # never pass through a committer rename) look ancient and
    # sweepable mid-commit. Past-direction skew is indistinguishable
    # from age, but FUTURE-direction evidence is observable: any commit
    # stamped ahead of this host's clock proves the fleet's clocks
    # disagree, so refuse to delete anything rather than trust mtimes.
    # (Entry timestamps are writer-clock time.time(), like file mtimes.)
    # Bounded scan (r15): only entries ABOVE the latest checkpoint (plus
    # the newest entry when the checkpoint is current) — O(suffix), not
    # O(all versions) of JSON reads per sweep. Skew evidence lives in
    # the newest stamps: an old future-stamped entry below a checkpoint
    # drifts into the past on its own, and every sweep re-checks the
    # live suffix where active writers commit.
    _vs = table.log.versions()
    _cp = table.log.latest_checkpoint_version()
    _cp_raw = table.log._read_checkpoint() if _cp is not None else None
    _recent = [v for v in _vs if _cp is None or v > _cp] or _vs[-1:]
    newest = max(
        (table.log.read_entry(v).committed_at for v in _recent), default=0.0
    )
    # skew evidence frozen BELOW the checkpoint still counts (r16,
    # ADVICE): checkpoints record the max writer stamp they froze, so a
    # future-stamped entry can't hide under one — without the field
    # (pre-upgrade checkpoints) the suffix scan is all there is, and
    # an old future stamp drifts into the past on its own.
    if _cp_raw is not None:
        newest = max(newest, float(_cp_raw.get("max_committed_at") or 0.0))
    if newest > now + CLOCK_SKEW_TOLERANCE_SECONDS:
        raise MaintenanceError(
            f"remove_orphan_files: newest commit is stamped {newest - now:.0f}s in "
            "this host's future — writer/sweeper clocks disagree; refusing to "
            "sweep on untrustworthy mtimes"
        )

    referenced: set[str] = set()
    if not full_scan and _cp_raw is not None and "referenced" in _cp_raw:
        # O(suffix) fast path (r16): the newest checkpoint carries the
        # cumulative protection set for everything at/below it (time-
        # travel reachability AND stage/branch/txn adds — see
        # TransactionLog._referenced_upto); anything referenced only
        # above it was added by a suffix entry, any lineage, so the
        # suffix's added_files complete the set.
        referenced.update(_cp_raw["referenced"])
        for v in _vs:
            if v > _cp_raw["version"]:
                referenced.update(
                    fi.path for fi in table.log.read_entry(v).added_files
                )
    else:
        for v in _vs:
            referenced.update(table.log.state_at(v).keys())
        # staged (write-audit-publish) snapshots and BRANCH commits are
        # outside every state fold but their files are NOT orphans —
        # stages await publish, branch files are reachable through
        # read(ref=...) and the eventual merge_branch. Every
        # branch-tagged entry still in the log is protected (even after
        # its branch is dropped/rewound): the safe direction —
        # expire_snapshots reclaims the entries once no live ref lists
        # them, and THEN the sweep may collect the files.
        for e in table.log.entries():
            if (
                e.operation == "stage"
                or (e.extra or {}).get("branch")
                or (e.extra or {}).get("txn")
            ):
                referenced.update(fi.path for fi in e.added_files)
        if full_scan and _cp_raw is not None and "referenced" in _cp_raw:
            # self-heal: replace the carried set with the freshly
            # derived one so a crashed expiry's leaked paths lose
            # protection for good (see the docstring)
            stale = set(_cp_raw["referenced"]) - referenced
            if stale:
                table.log.subtract_referenced(stale)

    deleted = 0
    dir_mtimes: dict[str, float] = {}
    for full in table.io.walk_files(table.data_dir):
        # io.relpath, NOT os.path.relpath: Hadoop statuses come back
        # scheme-qualified (file:/..., hdfs://...) even for tables
        # opened with plain paths — a raw relpath would mismatch every
        # referenced file and sweep LIVE data as orphans
        rel = table.io.relpath(full, table.table_dir)
        if rel in referenced:
            continue
        parent = os.path.dirname(full)
        if parent not in dir_mtimes:
            try:
                dir_mtimes[parent] = table.io.mtime(parent)
            except OSError:
                dir_mtimes[parent] = 0.0
        # age = max(file mtime, commit-dir mtime): an add_files hard
        # link preserves the SOURCE file's possibly-ancient mtime, but
        # its commit dir was created at adoption time — without the dir
        # floor, a sweep racing an in-flight adoption would delete the
        # staged links straight through the 24h safety window
        try:
            age_key = max(table.io.mtime(full), dir_mtimes[parent])
        except OSError:
            # vanished between walk and stat: a concurrent writer's
            # atomic-rename temp file (or another sweep won the race).
            # Either way there is nothing on disk to clean — skip.
            # Found by the maintenance-under-live-ingest stress test.
            continue
        if age_key < older_than:
            try:
                table.io.remove(full)
            except OSError:
                continue  # a racing sweep removed it first
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
        target_entry = table.log.read_entry(snapshot_id)
    except FileNotFoundError:
        raise MaintenanceError(f"snapshot {snapshot_id} does not exist (expired?)")
    if target_entry.operation == "stage":
        raise MaintenanceError(
            f"snapshot {snapshot_id} is an unpublished stage (write-audit-publish) "
            "snapshot — not part of the main lineage; publish it instead"
        )
    if not table.log.in_main_lineage(target_entry):
        raise MaintenanceError(
            f"snapshot {snapshot_id} is not a main-lineage snapshot (branch "
            "commit or uncommitted transaction entry) — merge/commit it first"
        )

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


def rollback_to_timestamp(table: LakehouseTable, timestamp: float) -> dict:
    """M5 companion (Iceberg's rollback_to_timestamp): roll back to the
    newest snapshot committed at or before `timestamp` — same new-head
    mechanics as rollback_to_snapshot."""
    eligible = [
        e.version
        for e in table.log.entries()
        # only main-lineage snapshots (not stage/branch/uncommitted
        # txn entries) are rollback targets
        if e.committed_at <= timestamp and table.log.in_main_lineage(e)
    ]
    if not eligible:
        raise MaintenanceError(f"no snapshot at or before {timestamp}")
    return rollback_to_snapshot(table, max(eligible))


def set_current_snapshot(table: LakehouseTable, snapshot_id: int) -> dict:
    """Iceberg's set_current_snapshot: make the table state the given
    snapshot's state. Identical mechanics to rollback_to_snapshot (a
    new head commit), but accepts FORWARD targets too — Iceberg splits
    the two procedures, so the SQL surface does as well."""
    res = rollback_to_snapshot(table, snapshot_id)
    return {"set_to": snapshot_id, "new_snapshot_id": res["new_snapshot_id"]}


def cherrypick_snapshot(table: LakehouseTable, snapshot_id: int) -> dict:
    """Iceberg's cherrypick_snapshot: apply ONE snapshot's changes on
    top of the current head without adopting the rest of its lineage
    (the publish half of write-audit-publish). Sound only for APPEND
    snapshots — their delta IS their added files, which are immutable
    and survive even if the snapshot was later rolled back away; a
    rewriting snapshot's delta is relative to its own parent and cannot
    be replayed onto a different head."""
    try:
        entry = table.log.read_entry(snapshot_id)
    except FileNotFoundError:
        raise MaintenanceError(f"snapshot {snapshot_id} does not exist (expired?)")
    if entry.operation not in ("append",):
        raise MaintenanceError(
            f"cherrypick_snapshot: snapshot {snapshot_id} is {entry.operation!r}; "
            "only append snapshots can be cherry-picked"
        )
    e = _replay_added_files(
        table, entry.added_files, "cherrypick_snapshot", {"cherrypicked_from": snapshot_id}
    )
    return {"cherrypicked": snapshot_id, "new_snapshot_id": e.snapshot_id}


def _replay_added_files(
    table: LakehouseTable, files, what: str, extra: dict
) -> LogEntry:
    """Shared commit closure for cherrypick/publish: replay a
    snapshot's added files onto the current head as a fresh append,
    refusing if any of them is already live (double-apply)."""

    def make(version: int) -> LogEntry:
        live = table.log.state_at()
        clash = [fi.path for fi in files if fi.path in live]
        if clash:
            raise CommitConflictError(
                f"{what}: {len(clash)} file(s) already live "
                f"(e.g. {clash[0]!r}) — snapshot already applied?"
            )
        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=time.time(),
            operation="append",
            # re-stamp the data sequence number: the rows enter the
            # MAIN lineage now, so equality deletes committed between
            # stage and publish must not apply to them. The NAME epoch
            # stays at the writing commit (physical column names never
            # change after the bytes exist); pre-tracking files pin it
            # to their original seq before the re-stamp loses it.
            added_files=tuple(
                _dc_replace(
                    fi,
                    seq=version,
                    name_epoch=fi.name_epoch if fi.name_epoch is not None else fi.seq,
                )
                for fi in files
            ),
            extra=extra,
        )

    return table.log.append(make)


def publish_changes(table: LakehouseTable, wap_id: str) -> dict:
    """Iceberg's publish_changes: graduate a staged write-audit-publish
    snapshot (see LakehouseTable.stage_append) into the main lineage.
    Finds the stage commit tagged `wap_id`, refuses double-publish, and
    replays its files as a real append through the same conflict check
    as cherrypick."""
    staged = [
        e
        for e in table.log.entries()
        if e.operation == "stage" and (e.extra or {}).get("wap_id") == wap_id
    ]
    if not staged:
        raise MaintenanceError(f"publish_changes: no staged snapshot with wap_id {wap_id!r}")
    if len(staged) > 1:
        # stage_append rejects wap_id reuse, but a log written before
        # that guard (or assembled by hand) can still carry duplicates;
        # silently publishing staged[-1] would strand the earlier stage
        # snapshots' files for the orphan sweep with no error anywhere
        raise MaintenanceError(
            f"publish_changes: wap_id {wap_id!r} matches {len(staged)} staged "
            f"snapshots ({[e.snapshot_id for e in staged]}) — ambiguous; "
            "publish by cherry-picking the intended snapshot id instead"
        )
    already = [
        e
        for e in table.log.entries()
        if (e.extra or {}).get("published_wap") == wap_id
    ]
    if already:
        raise MaintenanceError(
            f"publish_changes: wap_id {wap_id!r} already published "
            f"(snapshot {already[0].snapshot_id})"
        )
    entry = staged[-1]
    e = _replay_added_files(
        table,
        entry.added_files,
        "publish_changes",
        {"published_wap": wap_id, "staged_snapshot": entry.snapshot_id},
    )
    return {"published_wap": wap_id, "new_snapshot_id": e.snapshot_id}


def _check_unmanaged_ref(name: str, what: str, managed: bool = False) -> None:
    """Per-table refs under the reserved `catalog.` prefix belong to a
    CATALOG-wide branch (catalog_refs.py): merging or rebasing one
    directly would publish a member table's chain outside the catalog
    record's pins/marker protocol — the catalog merge would then
    double-apply or spuriously conflict. Refuse unless the catalog
    layer itself (managed=True) is calling."""
    if not managed and name.startswith("catalog."):
        raise MaintenanceError(
            f"{what}: ref {name!r} is managed by a catalog-wide branch — "
            f"use merge_catalog_branch/rebase_catalog_branch on "
            f"{name.split('.', 1)[1]!r} instead"
        )


def merge_branch(table: LakehouseTable, name: str) -> dict:
    """Publish a branch's commits onto main — the Nessie merge that
    completes the write-on-ref flow (`append(ref=...)` /
    `read(ref=...)`; the reference pins `ref=main` in
    /root/reference/spark/conf/spark-defaults.conf:9 against the Nessie
    service of docker-compose.yml:6).

    One new main commit carries the branch chain's NET file effect
    (files added then removed within the branch cancel out). When main
    has not advanced past the fork base this is a fast-forward; either
    way the commit goes through the standard conflict validation:
    every file the branch removed must still be live on main (a
    concurrent main delete/compaction that touched them fails the
    merge with CommitConflictError — Nessie's content-conflict
    rejection), and none of the branch's files may already be live
    (double-apply guard). Added files re-stamp their data sequence
    number to the merge version: the rows enter the main lineage NOW,
    so equality deletes committed between branch write and merge must
    not apply to them (same rule as publish_changes).

    After the merge the branch is re-anchored at the merge commit
    (base = head = merge version, empty chain), so merging is
    exactly-once: a second merge_branch is a no-op and the branch can
    keep taking writes from the new anchor."""
    _check_unmanaged_ref(name, "merge_branch")
    base, head, chain = table.log.branch_info(name)
    if not chain:
        return {"merged_commits": 0, "new_snapshot_id": None, "fast_forward": False}
    added: dict[str, FileInfo] = {}
    removed: set[str] = set()
    for v in chain:
        entry = table.log.read_entry(v)
        for p in entry.removed_files:
            if p in added:
                added.pop(p)  # branch-internal churn: never reached main
            else:
                removed.add(p)
        for fi in entry.added_files:
            added[fi.path] = fi
    fast_forward = not any(
        e.version > base and table.log.in_main_lineage(e)
        for e in table.log.entries()
    )

    def make(version: int) -> LogEntry:
        live = table.log.state_at()
        gone = [p for p in removed if p not in live]
        if gone:
            raise CommitConflictError(
                f"merge_branch {name!r}: {len(gone)} file(s) the branch "
                f"removed are no longer live on main (e.g. {gone[0]!r}) — a "
                "concurrent main commit replaced them; rebase_branch(..., "
                "drop_conflicting=True) keeps the clean commits, then "
                "re-apply the dropped change on the rebased branch"
            )
        clash = [p for p in added if p in live]
        if clash:
            raise CommitConflictError(
                f"merge_branch {name!r}: {len(clash)} branch file(s) already "
                f"live on main (e.g. {clash[0]!r}) — branch already merged?"
            )
        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=time.time(),
            operation="merge",
            added_files=tuple(
                _dc_replace(
                    fi,
                    seq=version,
                    name_epoch=fi.name_epoch if fi.name_epoch is not None else fi.seq,
                )
                for fi in added.values()
            ),
            removed_files=tuple(sorted(removed)),
            extra={
                "merge_branch": name,
                "branch_base": base,
                "branch_head": head,
                "merged_commits": list(chain),
                "fast_forward": fast_forward,
            },
        )

    e = table.log.append(make)
    # re-anchor at the merge commit, dropping EXACTLY the merged chain:
    # a branch commit that raced in after the chain was captured stays
    # on the branch (a blank update_ref reset would silently orphan it)
    table.log.reanchor_branch(name, e.version, merged=set(chain))
    return {
        "merged_commits": len(chain),
        "new_snapshot_id": e.snapshot_id,
        "fast_forward": fast_forward,
    }


def rebase_branch(
    table: LakehouseTable,
    name: str,
    onto: int | None = None,
    drop_conflicting: bool = False,
    managed: bool = False,
) -> dict:
    """Re-anchor a branch at a newer main snapshot — the content-aware
    recovery flow merge_branch's conflict error promises ("rebase the
    branch and re-apply"), which Nessie ships alongside merge and
    Iceberg users otherwise hand-roll as update_ref + replay.

    Because branch state is (main folded to the fork base) + (the ref's
    explicit commit chain), moving `base` IS the rebase: the same chain
    re-applies over the new base through the ordinary fold — no log
    entries are rewritten, no data files move, and every file keeps its
    write-time seq/name_epoch stamps. What rebase adds over update_ref
    (which CLEARS the chain) is validation + selective keep:

    - The chain replays commit-by-commit over the state at the target.
      A commit whose removals touch files not live there, or whose adds
      clash with files already live there, CONFLICTS — the error names
      the first conflicting commit (Nessie's per-key content conflict).
    - `drop_conflicting=True` keeps the clean prefix-respecting subset
      instead: conflicting commits are dropped from the chain (their
      log entries stay for audit; expire_snapshots reclaims them) and
      reported, so the caller re-applies just those logical changes on
      the rebased branch. Later commits are validated against the
      state WITHOUT the dropped ones, so the kept chain is coherent.

    Two everyday uses: refresh a long-lived branch's view of main (its
    reads fold main only up to the fork base), and un-stick a branch
    whose merge_branch hit CommitConflictError. Validation and the ref
    rewrite run inside the per-ref lock, so a branch commit racing the
    rebase either lands before plan() (and is validated) or after the
    new ref is written (and chains onto the rebased base)."""
    _check_unmanaged_ref(name, "rebase_branch", managed=managed)
    target = onto if onto is not None else table.log.latest_main_version()
    if target is None:
        raise MaintenanceError(f"rebase_branch {name!r}: table has no main snapshot")

    dropped: list[dict] = []

    def plan(ref: dict) -> list[int]:
        chain = sorted(ref.get("commits", []))
        state = table.log.state_at(target)
        kept: list[int] = []
        for v in chain:
            e = table.log.read_entry(v)
            gone = [p for p in e.removed_files if p not in state]
            clash = [fi.path for fi in e.added_files if fi.path in state]
            if gone or clash:
                if not drop_conflicting:
                    what = (
                        f"removes {len(gone)} file(s) not live (e.g. {gone[0]!r})"
                        if gone
                        else f"adds {len(clash)} file(s) already live (e.g. {clash[0]!r})"
                    )
                    raise CommitConflictError(
                        f"rebase_branch {name!r}: branch commit {v} {what} at "
                        f"main snapshot {target} — a main change conflicts with "
                        "it; re-run with drop_conflicting=True to keep the "
                        "non-conflicting commits and re-apply that change by "
                        "hand on the rebased branch"
                    )
                dropped.append(
                    {"version": v, "gone": len(gone), "clash": len(clash)}
                )
                continue
            for p in e.removed_files:
                state.pop(p, None)
            for fi in e.added_files:
                state[fi.path] = fi
            kept.append(v)
        return kept

    raw = table.log.rebase_ref(name, target, plan=plan)
    return {
        "branch": name,
        "new_base": target,
        "kept_commits": len(raw["commits"]),
        "dropped_commits": dropped,
    }


def rewrite_position_deletes(table: LakehouseTable) -> dict:
    """M6: maintain the content=1 position-delete files merge-on-read
    DELETEs accumulate (guide :17, :336-340): drop DANGLING entries
    (tombstones for data files that were since rewritten or removed —
    their rows are already gone) and compact the survivors into few
    sorted delete files, shrinking the read path's anti-join input.
    One `replace` commit; a concurrent writer that races it conflicts
    through the standard removed-still-live validation.

    Scale: the Spark job reads only the delete files (tombstone-sized,
    not data-sized); the live-data-path side of the pruning join is
    metadata, broadcast."""
    state = table.log.state_at()
    data_state, pos_files, _eq = LakehouseTable._split_state(state)
    if not pos_files:
        return {
            "rewritten_delete_files": 0,
            "removed_delete_files": 0,
            "dangling_entries_dropped": 0,
            "remaining_delete_files": 0,
        }
    spark = table.spark
    pos_paths = sorted(fi.path for fi in pos_files)
    dels = spark.read.schema(POS_DELETE_SCHEMA).parquet(
        *[os.path.join(table.table_dir, p) for p in pos_paths]
    )
    from pyspark.sql import functions as F

    live_df = local_df(spark, 
        [(p,) for p in data_state] or [("",)], "file_path string"
    )
    kept = dels.join(F.broadcast(live_df), "file_path", "left_semi")
    total = sum(fi.row_count for fi in pos_files)
    surviving = kept.count()
    dangling = total - surviving
    if dangling == 0 and len(pos_paths) <= 1:
        return {
            "rewritten_delete_files": 0,
            "removed_delete_files": 0,
            "dangling_entries_dropped": 0,
            "remaining_delete_files": len(pos_paths),
            "skipped": True,
        }

    new_files: tuple[FileInfo, ...] = ()
    if surviving:
        out_dir = os.path.join(table.data_dir, f"v{uuid.uuid4().hex[:12]}")
        (
            kept.repartitionByRange(1, "file_path", "pos")
            .sortWithinPartitions("file_path", "pos")
            .write.mode("error")
            .parquet(out_dir)
        )
        written = table._scan_written(out_dir)
        new_files = tuple(
            _dc_replace(fi, content=1) for fi in written if fi.row_count
        )
        for fi in written:
            if not fi.row_count:
                table.io.remove(os.path.join(table.table_dir, fi.path))

    def make(version: int) -> LogEntry:
        live = table.log.state_at()
        gone = [p for p in pos_paths if p not in live]
        if gone:
            raise CommitConflictError(
                f"rewrite_position_deletes on {table.identifier}: {len(gone)} "
                f"delete file(s) no longer live (e.g. {gone[0]!r}) — re-plan"
            )
        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=time.time(),
            operation="replace",
            added_files=tuple(_dc_replace(fi, seq=version, name_epoch=version) for fi in new_files),
            removed_files=tuple(pos_paths),
            extra={"rewrite": "position-deletes"},
        )

    try:
        table.log.append(make)
    except BaseException:
        for fi in new_files:  # don't leak the staged compacted output
            try:
                table.io.remove(os.path.join(table.table_dir, fi.path))
            except OSError:
                pass
        raise
    return {
        "rewritten_delete_files": len(pos_paths),
        "removed_delete_files": len(pos_paths) - len(new_files),
        "dangling_entries_dropped": dangling,
        "remaining_delete_files": len(new_files),
    }


def _drop_stale_eq_deletes(table: LakehouseTable) -> int:
    """Metadata-only commit removing equality-delete files that can no
    longer delete anything: every live data file either post-dates them
    (sequence rule) or has provably-disjoint column ranges. Returns the
    number of delete files dropped."""
    state = table.log.state_at()
    data_state, _pos, eq_files = LakehouseTable._split_state(state)
    stale = [
        efi.path
        for efi in eq_files
        if not any(
            table._eq_delete_may_apply(fi, efi) for fi in data_state.values()
        )
    ]
    if not stale:
        return 0

    def make(version: int) -> LogEntry:
        live = table.log.state_at()
        gone = [p for p in stale if p not in live]
        if gone:
            raise CommitConflictError(
                f"equality-delete cleanup on {table.identifier}: {len(gone)} "
                "file(s) no longer live — re-plan"
            )
        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=time.time(),
            operation="replace",
            removed_files=tuple(stale),
            extra={"rewrite": "stale-equality-deletes"},
        )

    table.log.append(make)
    return len(stale)


def rewrite_equality_deletes(table: LakehouseTable) -> dict:
    """M6 companion: fold content=2 equality deletes back into data
    files (Iceberg's rewrite converts them to position deletes during
    compaction; we fold fully, matching this format's copy-on-write
    data path). Blast radius is stats-scoped: only data files that
    PREDATE some eq delete (sequence rule) AND whose column ranges
    overlap it rewrite; provably-unaffected files keep their bytes and
    the delete files drop regardless, because the overlap test is the
    same one the read path uses to skip them."""
    state = table.log.state_at()
    data_state, _pos, eq_files = LakehouseTable._split_state(state)
    if not eq_files:
        return {"rewritten_delete_files": 0, "rewritten_data_files": 0}
    eq_paths = sorted(fi.path for fi in eq_files)
    deletes_fp = tuple(sorted(p for p, fi in state.items() if fi.content != 0))
    affected = sorted(
        p
        for p, fi in data_state.items()
        if any(table._eq_delete_may_apply(fi, efi) for efi in eq_files)
    )
    if not affected:
        dropped = _drop_stale_eq_deletes(table)
        return {"rewritten_delete_files": dropped, "rewritten_data_files": 0}
    survivors = table._read_rel(affected)  # pos + eq deletes applied
    files = table._write_files(
        survivors,
        input_bytes=sum(data_state[p].size_bytes for p in affected),
    )

    def make(version: int) -> LogEntry:
        live = table.log.state_at()
        gone = [p for p in affected + eq_paths if p not in live]
        if gone:
            raise CommitConflictError(
                f"rewrite_equality_deletes on {table.identifier}: {len(gone)} "
                f"planned file(s) no longer live (e.g. {gone[0]!r}) — re-plan"
            )
        now_deletes = tuple(sorted(p for p, fi in live.items() if fi.content != 0))
        if now_deletes != deletes_fp:
            raise CommitConflictError(
                f"rewrite_equality_deletes on {table.identifier}: delete files "
                "changed since planning — re-plan"
            )
        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=time.time(),
            operation="replace",
            added_files=tuple(_dc_replace(fi, seq=version, name_epoch=version) for fi in files),
            removed_files=tuple(affected) + tuple(eq_paths),
            extra={"rewrite": "equality-deletes"},
        )

    try:
        table.log.append(make)
    except BaseException:
        for fi in files:
            try:
                table.io.remove(os.path.join(table.table_dir, fi.path))
            except OSError:
                pass
        raise
    return {
        "rewritten_delete_files": len(eq_paths),
        "rewritten_data_files": len(affected),
    }


# What Spark 4.x's vectorized parquet reader will widen at scan time
# (measured on this Spark: int32 reads fine under int/bigint/double
# schemas; string-under-bigint throws PARQUET_COLUMN_DATA_TYPE_MISMATCH
# on the first read AFTER the adopting commit). Anything outside the
# map must match exactly.
_ADOPT_WIDENINGS = {
    "tinyint": {"smallint", "int", "bigint", "double"},
    "smallint": {"int", "bigint", "double"},
    "int": {"bigint", "double"},
    "float": {"double"},
}


def _adoptable_type(ft, tt) -> bool:
    """Structural widening check: can a file column of Spark type `ft`
    be read under table type `tt`? Applies _ADOPT_WIDENINGS element-
    wise through array/map/struct (measured: Spark 4's vectorized
    reader upcasts array<int> under array<bigint>, map values, and
    struct fields the same as top-level primitives — ADVICE r7 flagged
    the flat simpleString compare as over-strict for exactly these).
    Struct fields the table lacks project away; table struct fields the
    file lacks would read as null-for-every-row, which silently drops
    data a name-level check promised — incompatible."""
    from pyspark.sql import types as T

    if ft == tt:
        return True
    if isinstance(ft, T.ArrayType) and isinstance(tt, T.ArrayType):
        return _adoptable_type(ft.elementType, tt.elementType)
    if isinstance(ft, T.MapType) and isinstance(tt, T.MapType):
        return _adoptable_type(ft.keyType, tt.keyType) and _adoptable_type(
            ft.valueType, tt.valueType
        )
    if isinstance(ft, T.StructType) and isinstance(tt, T.StructType):
        file_fields = {f.name: f.dataType for f in ft.fields}
        return all(
            f.name in file_fields and _adoptable_type(file_fields[f.name], f.dataType)
            for f in tt.fields
        )
    return tt.simpleString() in _ADOPT_WIDENINGS.get(ft.simpleString(), ())


def _incompatible_columns(io, path: str, table_types: dict[str, str]):
    """(name, file_type, table_type) for every adopted-file column whose
    footer type cannot be read under the table schema. Footer-only —
    no data pages, no Spark job. A file column with an arrow type Spark
    can't represent at all (uint64, …) is incompatible by definition."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import from_arrow_type

    bad = []
    for field in io.parquet_arrow_schema(path):
        tt = table_types.get(field.name)
        if tt is None:
            continue  # extra column: reads project it away
        try:
            ft = from_arrow_type(field.type)
        except Exception:
            bad.append((field.name, str(field.type), tt))
            continue
        if not _adoptable_type(ft, _parse_ddl_cached(tt)):
            bad.append((field.name, ft.simpleString(), tt))
    return bad


def add_files(table: LakehouseTable, source_dir: str) -> dict:
    """Iceberg's `add_files` procedure: ADOPT existing parquet files
    into the table as a snapshot commit — zero rewrite (hard links on
    POSIX via FileIO.link_or_copy; a byte copy only where the store
    has no links). The bulk-migration path: a directory of historical
    parquet joins the table format, gains snapshots/time-travel/
    maintenance, and its footer stats enter scan planning, all without
    touching data bytes.

    Validation: every adopted file's footer must contain ALL table
    columns, AND each shared column's footer type must be readable
    under the table schema (exact match, or a widening Spark's parquet
    reader performs: integer widening, int->double, float->double).
    Name-only validation would let a string-typed file into a bigint
    column — the commit succeeds, then EVERY subsequent scan fails
    (`PARQUET_COLUMN_DATA_TYPE_MISMATCH`), leaving the table unreadable
    until manual repair; Iceberg's add_files checks compatibility for
    the same reason. This rejects hive-layout sources whose writers
    dropped the partition column from the files (the value lives only
    in the dir name there) — adopting one would silently null that
    column; use INSERT INTO ... SELECT for those.

    DELIBERATE divergence from Iceberg, nested fields included: a
    table STRUCT field absent from the file is rejected, where
    Iceberg's field-ID name mapping reads it as null for every row.
    Iceberg can afford null-fill because field IDs distinguish "field
    intentionally absent" from "field renamed or mis-written"; adopted
    foreign parquet has no field IDs, so a missing struct field is
    indistinguishable from a writer bug, and null-filling would be
    silent data loss behind a commit that reported success. The same
    rule therefore applies at every nesting depth: present-but-wider
    is adopted (element-wise widening map above), absent is refused
    loudly — re-export the data or evolve the table schema first.
    Pinned by tests/test_add_files.py's missing-struct-field case. Extra columns are
    fine (reads project through the table schema). Adopted files carry
    no partition tuple, so on a partitioned table they are always
    scanned (pruning is advisory); the next compaction migrates them
    into the current spec's layout.
    """
    schema = table.schema() or table._schema()
    need = {f.name for f in schema.fields}
    if not need:
        raise MaintenanceError("add_files: table has no schema to validate against")
    table_types = {f.name: f.dataType.simpleString() for f in schema.fields}
    io = table.io
    src_root = os.path.abspath(source_dir)
    if (src_root + os.sep).startswith(os.path.abspath(table.table_dir) + os.sep) or src_root == os.path.abspath(table.table_dir):
        raise MaintenanceError(
            "add_files: source_dir is inside the table directory — "
            "self-adoption would duplicate rows and confuse the orphan sweep"
        )
    srcs = sorted(p for p in io.walk_files(source_dir) if p.endswith(".parquet"))
    if not srcs:
        raise MaintenanceError(f"add_files: no parquet files under {source_dir!r}")
    for p in srcs:
        have = set(io.parquet_column_names(p))
        missing = sorted(need - have)
        if missing:
            raise MaintenanceError(
                f"add_files: {p!r} lacks table column(s) {missing} — hive-"
                "partitioned sources whose files dropped the partition column "
                "must be re-written (INSERT INTO ... SELECT), not adopted"
            )
        bad = _incompatible_columns(io, p, table_types)
        if bad:
            detail = "; ".join(
                f"{name}: file has {ft}, table needs {tt}" for name, ft, tt in bad
            )
            raise MaintenanceError(
                f"add_files: {p!r} has incompatible column type(s) ({detail}) — "
                "adopting it would make every subsequent scan fail; re-write "
                "via INSERT INTO ... SELECT with casts instead"
            )
    out_dir = os.path.join(table.data_dir, f"v{uuid.uuid4().hex[:12]}")
    infos = []
    for i, src in enumerate(srcs):
        dst = os.path.join(out_dir, f"adopted-{i:05d}.parquet")
        io.link_or_copy(src, dst)
        rows, stats = io.parquet_file_stats(dst)
        infos.append(
            FileInfo(
                path=io.relpath(dst, table.table_dir),
                size_bytes=io.size(dst),
                row_count=rows,
                stats=stats or None,
            )
        )

    def make(version: int) -> LogEntry:
        return LogEntry(
            version=version,
            snapshot_id=version,
            committed_at=time.time(),
            operation="add_files",
            added_files=tuple(_dc_replace(fi, seq=version, name_epoch=version) for fi in infos),
            extra={"source_dir": source_dir},
        )

    try:
        e = table.log.append(make)
    except BaseException:
        for fi in infos:
            try:
                table.io.remove(os.path.join(table.table_dir, fi.path))
            except OSError:
                pass
        raise
    return {
        "added_files": len(infos),
        "added_records": sum(fi.row_count for fi in infos),
        "snapshot_id": e.snapshot_id,
    }


def snapshot_table(lake, source_dir: str, identifier: str) -> dict:
    """Iceberg's `snapshot` procedure: create a NEW lakehouse table
    whose first snapshot adopts an existing parquet directory in place
    (schema inferred from the source footers, files hard-linked via
    add_files — zero rewrite, source untouched). The try-before-migrate
    path: the snapshot table gets time travel/metadata/maintenance
    while the original directory keeps serving whatever reads it today.
    """
    ns, _ = identifier.split(".", 1)
    if ns not in lake.namespaces():
        raise MaintenanceError(f"namespace {ns} does not exist")
    schema = lake.spark.read.parquet(source_dir).schema
    t = lake.create_table(identifier, schema=schema)
    try:
        res = add_files(t, source_dir)
    except BaseException:
        lake.drop_table(identifier)  # no half-created snapshot table
        raise
    return {
        "table": identifier,
        "added_files": res["added_files"],
        "added_records": res["added_records"],
    }
