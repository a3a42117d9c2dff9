"""Transaction log: the table-format core.

The reference stack gets multi-version table semantics from Apache
Iceberg (snapshot-per-commit, metadata JSON + manifest Avro under
`metadata/` — narrated at /root/reference/SPARK_ICEBERG_GUIDE.md:117-118,
136-139). We re-express the same semantics as a minimal JSON
commit log: one `metadata/<version>.json` entry per commit, where a
commit is `{version, snapshot_id, committed_at, operation,
added_files, removed_files, properties}` and the live file set of any
version is the fold of add/remove over entries `<= version`.

Atomicity on a POSIX filesystem: entries are created with O_EXCL
(`open(..., "x")`), so two concurrent writers racing for the same
version number cannot both win — the loser re-reads and retries with
the next version. This is the same optimistic-concurrency shape
Iceberg/Delta use against an atomic-swap primitive; on an object
store you would swap the primitive for a conditional PUT. Single-node
scope (and that swap point) is documented in SURVEY.md §4.

Checkpoints (`metadata/checkpoint-<version>.json`) store the fully
resolved state at a version so readers replay only the suffix —
the role Iceberg's `rewrite_manifests` plays for manifest files
(/root/reference/SPARK_ICEBERG_GUIDE.md:243-248).
"""

from __future__ import annotations

import json
import os
import re
import time as _time
from dataclasses import asdict, dataclass
from dataclasses import replace as _dc_replace
from typing import Any

from .fs import FileIO, LocalFileIO

_ENTRY_RE = re.compile(r"^(\d{10})\.json$")
_CHECKPOINT_RE = re.compile(r"^checkpoint-(\d{10})\.json$")
_REF_RE = re.compile(r"^ref-([A-Za-z0-9._-]+)\.json$")

# How old an advisory lock file must be before a waiter presumes its
# holder crashed and steals it (_with_ref_lock here; the catalog merge
# lock in catalog_refs.py). Module-level so crash-recovery tests can
# lower it instead of sleeping out the production threshold.
LOCK_STEAL_SECONDS = 60.0


class CommitConflictError(RuntimeError):
    """A commit's removed-file set no longer matches the live table
    state — a concurrent commit (e.g. a compaction racing a delete)
    replaced files this commit planned against. Iceberg raises a
    ValidationException in the same situation; callers should re-plan
    from the new state."""


@dataclass(frozen=True)
class FileInfo:
    """One immutable data file. `path` is relative to the table root so
    the table directory can be relocated (or re-homed onto an object
    store) without rewriting the log."""

    path: str
    size_bytes: int
    row_count: int
    # Iceberg v2 content classes (/root/reference/SPARK_ICEBERG_GUIDE.md:336-340):
    # 0 = data, 1 = position deletes (rows of file_path+pos), 2 =
    # equality deletes (rows of the equality columns' values)
    content: int = 0
    # per-column [min, max, null_count] footer metrics (Iceberg's
    # manifest lower_bounds/upper_bounds/null_value_counts analog);
    # None on files logged before stats tracking — pruning must treat
    # that as "scan it"
    stats: dict[str, list] | None = None
    # data sequence number (Iceberg's manifest-entry sequence number):
    # the version of the commit that FIRST added this file. Stamped at
    # commit time; preserved verbatim through rollback/checkpoint so an
    # equality delete (which applies only to files with seq < its own)
    # keeps the same victims across history rewinds. None on files
    # logged before sequence tracking — readers treat that as "oldest".
    seq: int | None = None
    # content=2 only: the equality columns this delete file keys on
    eq_cols: list | None = None
    # partition-spec tables: this file's partition values (transform
    # name -> hive dir string) — the manifest-entry partition tuple
    # analog that plan-time partition pruning consults. None on
    # unpartitioned (or pre-spec) files.
    partition: dict | None = None
    # the log position whose SCHEMA this file was physically written
    # under — the rename/drop name-mapping epoch. Unlike `seq`, which
    # re-stamps when files enter the main lineage later (merge_branch,
    # publish_changes, cherrypick — the equality-delete ordering rule),
    # name_epoch is stamped once at the writing commit and preserved
    # through every replay: physical column names never change after
    # the bytes are written. None on pre-tracking files — readers fall
    # back to `seq`.
    name_epoch: int | None = None


@dataclass(frozen=True)
class LogEntry:
    version: int
    snapshot_id: int
    committed_at: float  # unix seconds, UTC
    operation: str  # create | append | overwrite | replace | rollback | set_properties
    added_files: tuple[FileInfo, ...] = ()
    removed_files: tuple[str, ...] = ()  # relative paths
    properties: dict[str, str] | None = None  # full property map after this commit
    extra: dict[str, Any] | None = None  # e.g. rollback target snapshot


class TransactionLog:
    def __init__(self, metadata_dir: str, io: FileIO | None = None):
        self.metadata_dir = metadata_dir
        self.io = io or LocalFileIO()
        self.io.makedirs(metadata_dir)
        # resolved-state memo: a FIXED version's state never changes
        # (the log is append-only; expiry checkpoints before dropping
        # entries, so replay stays equivalent for surviving versions).
        # Callers get a shallow COPY — several fold the returned dict
        # in place. Bounded: newest few versions only.
        self._state_cache: dict[int, dict[str, FileInfo]] = {}
        # decided (committed/aborted) transaction-marker states only
        self._txn_cache: dict[str, str] = {}
        # parsed-entry memo: entry files are write-once (created with
        # O_EXCL at log.append, never rewritten; expiry deletes, never
        # edits), so a successfully parsed LogEntry is immutable and
        # cacheable for the life of this instance. Callers never mutate
        # entries (frozen dataclasses, treated as values throughout).
        self._entry_cache: dict[int, LogEntry] = {}
        # txn ids whose intent sentinel this instance already ensured
        self._txn_intents_ensured: set[str] = set()

    # ---- reading -----------------------------------------------------

    def versions(self) -> list[int]:
        out = []
        for name in self.io.listdir(self.metadata_dir):
            m = _ENTRY_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_main_version(self) -> int | None:
        """Newest MAIN-lineage version: skips branch commits (which
        live outside main until merged), unpublished stage snapshots,
        and uncommitted multi-table-transaction entries — the snapshot
        a ref may anchor at or a main read means by "current"."""
        for v in reversed(self.versions()):
            if self.in_main_lineage(self.read_entry(v)):
                return v
        return None

    # ---- multi-table transaction markers ------------------------------
    # A multi-table transaction (see transaction.py) stages one entry
    # per table tagged `extra.txn = <id>`; ALL of them become visible
    # at once when the single marker file <warehouse>/.txns/<id>.json
    # is created with status "committed" — the one-pointer-swap that
    # makes the cross-table commit atomic (the role Nessie's global
    # commit plays for the reference stack's catalog,
    # /root/reference/docker-compose.yml:6). The marker dir is derived
    # from the warehouse layout (<warehouse>/<ns>/<table>/metadata), so
    # every reader of a table — through the catalog or standalone —
    # resolves the same marker.

    @property
    def txn_dir(self) -> str:
        return os.path.normpath(
            os.path.join(self.metadata_dir, os.pardir, os.pardir, os.pardir, ".txns")
        )

    def txn_status(self, txn_id: str) -> str:
        """'pending' | 'committed' | 'aborted'. Decided states are
        immutable (the marker is created exactly once with O_EXCL), so
        they cache; pending re-reads every time."""
        cached = self._txn_cache.get(txn_id)
        if cached is not None:
            return cached
        path = os.path.join(self.txn_dir, f"{txn_id}.json")
        try:
            status = json.loads(self.io.read_text(path)).get("status", "pending")
        except (OSError, ValueError):
            return "pending"
        if status in ("committed", "aborted"):
            self._txn_cache[txn_id] = status
            # first discovery of a decision made elsewhere: retire the
            # intent sentinel so future commits' pending-claims guard
            # short-circuits (guarded by _txn_cache — runs once)
            self._clear_txn_intent(txn_id)
        return status

    def decide_txn(self, txn_id: str, status: str) -> str:
        """Decide an undecided multi-table/catalog-merge txn with the
        SAME O_EXCL marker create its orchestrator uses, returning the
        status that actually stuck. A main writer whose commit overlaps
        a pending txn's staged removals calls this with 'aborted' —
        first committer wins: either the abort lands (the writer
        proceeds, the txn's own flip later reads it and reports the
        abort) or the txn's commit landed first (the writer learns
        'committed' and must re-plan). Both directions resolve through
        one atomic create, which is what closes the txn's
        validate->flip window."""
        self.io.makedirs(self.txn_dir)
        path = os.path.join(self.txn_dir, f"{txn_id}.json")
        payload = json.dumps(
            {
                "txn": txn_id,
                "status": status,
                "decided_at": _time.time(),
                "decided_by": "conflicting-writer",
            }
        )
        if self.io.create_exclusive(path, payload):
            self._txn_cache[txn_id] = status
            self._clear_txn_intent(txn_id)
            return status
        return self.txn_status(txn_id)

    # ---- txn intent sentinels ------------------------------------------
    # `<warehouse>/.txns/<id>.intent`, created by log.append BEFORE the
    # first entry tagged `extra.txn = <id>` lands (create-before-stage:
    # a crash between the two leaves a harmless stale sentinel, never a
    # staged entry without one). They exist so the per-commit pending-
    # claims guard (`pending_txn_removed_claims`) can answer "no txn in
    # flight" — the overwhelmingly common case — from ONE dir listing
    # instead of re-reading every above-checkpoint log entry on every
    # main commit (the r14 +34% lakehouse_multi_table_txn regression).
    # Decided txns clear their sentinel best-effort (marker creators and
    # first status discovery); a leftover sentinel only costs one extra
    # bounded scan, never correctness.

    def _txn_intent_path(self, txn_id: str) -> str:
        return os.path.join(self.txn_dir, f"{txn_id}.intent")

    def _ensure_txn_intent(self, txn_id: str) -> None:
        if txn_id in self._txn_intents_ensured:
            return
        self.io.makedirs(self.txn_dir)
        self.io.create_exclusive(self._txn_intent_path(txn_id), txn_id)
        self._txn_intents_ensured.add(txn_id)

    def _clear_txn_intent(self, txn_id: str) -> None:
        try:
            self.io.remove(self._txn_intent_path(txn_id))
        except OSError:
            pass
        self._txn_intents_ensured.discard(txn_id)

    def in_main_lineage(self, entry: LogEntry) -> bool:
        """Does this entry participate in main-lineage state folds?
        False for write-audit-publish stage snapshots (await publish),
        branch commits (await merge), and transaction entries whose
        marker isn't committed (pending or aborted)."""
        if entry.operation == "stage":
            return False
        extra = entry.extra or {}
        if extra.get("branch"):
            return False
        tx = extra.get("txn")
        if tx is not None and self.txn_status(tx) != "committed":
            return False
        return True

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def pending_txn_removed_claims(self) -> dict[str, str]:
        """path -> txn id for every file a STAGED, still-UNDECIDED
        multi-table/catalog-merge entry removes. This is half of the
        validate->marker-flip race closure (r14): a staged txn entry
        already owns a version slot, so any main commit claiming a
        LATER slot re-runs its make() against a log that contains the
        pending entry; on overlap the writer DECIDES the undecided txn
        aborted through the same O_EXCL marker create the txn's own
        commit uses (`decide_txn`) — first committer wins, arbitrated
        by one atomic primitive, so exactly one of {racing writer, txn
        flip} survives and the silent-duplication window is closed,
        not shrunk. Writers that landed BEFORE the staging are seen by
        the txn's marker-time revalidation (the other half). Pending
        entries always sit above the newest checkpoint (checkpoints
        refuse to freeze past a pending txn), so the scan is bounded.

        Cost (r15): the common case — no txn in flight — is ONE
        `.txns/` dir listing, zero entry reads. log.append creates an
        `<id>.intent` sentinel before the first `extra.txn` entry
        lands (every staged entry goes through append, so
        staged-pending implies intent-present), and decided txns
        retire theirs; only while an undecided intent exists does the
        above-checkpoint entry scan run — and those parses hit the
        immutable-entry cache. Pre-r15 this re-read every
        above-checkpoint entry JSON per commit: O(n²) metadata IO
        across an uncheckpointed lifecycle, pure waste with no txns."""
        pending: set[str] = set()
        for name in self.io.listdir(self.txn_dir):
            if not name.endswith(".intent"):
                continue
            tx = name[: -len(".intent")]
            if self.txn_status(tx) == "pending":
                pending.add(tx)
            else:
                self._clear_txn_intent(tx)  # stale sentinel of a decided txn
        if not pending:
            return {}
        cp = self.latest_checkpoint_version()
        out: dict[str, str] = {}
        for v in self.versions():
            if cp is not None and v <= cp:
                continue
            e = self.read_entry(v)
            tx = (e.extra or {}).get("txn")
            if tx is not None and self.txn_status(tx) == "pending":
                for p in e.removed_files:
                    out[p] = tx
        return out

    def read_entry(self, version: int) -> LogEntry:
        cached = self._entry_cache.get(version)
        if cached is not None:
            return cached
        path = os.path.join(self.metadata_dir, f"{version:010d}.json")
        try:
            raw = json.loads(self.io.read_text(path))
        except json.JSONDecodeError:
            # torn read: the entry exists (listed by versions()) but its
            # writer hasn't finished flushing. LocalFileIO commits are
            # link(2)-atomic so this never happens there, but
            # HadoopFileIO's create(no-overwrite) arbiter exposes a
            # brief partial-content window. Entries are KB-sized, so a
            # short bounded retry outwaits any live writer; if the
            # content never parses, the entry is genuinely corrupt and
            # the error must surface.
            deadline = _time.monotonic() + 5.0
            while True:
                _time.sleep(0.05)
                try:
                    raw = json.loads(self.io.read_text(path))
                    break
                except json.JSONDecodeError:
                    if _time.monotonic() >= deadline:
                        raise
        entry = LogEntry(
            version=raw["version"],
            snapshot_id=raw["snapshot_id"],
            committed_at=raw["committed_at"],
            operation=raw["operation"],
            added_files=tuple(FileInfo(**fi) for fi in raw["added_files"]),
            removed_files=tuple(raw["removed_files"]),
            properties=raw.get("properties"),
            extra=raw.get("extra"),
        )
        self._entry_cache[version] = entry
        return entry

    def entries(self, upto: int | None = None) -> list[LogEntry]:
        vs = self.versions()
        if upto is not None:
            vs = [v for v in vs if v <= upto]
        return [self.read_entry(v) for v in vs]

    def entries_range(self, start: int = 0, upto: int | None = None):
        """Surviving entries with start <= version <= upto, reading
        ONLY those entry files. Checkpoint-seeded folds must iterate
        this, not `entries(upto)` with a below-start skip — that shape
        still READS every entry JSON below the checkpoint, turning
        every cold fold into O(all versions) metadata IO (the r16
        orphan-sweep finding; at 100 TB the metadata log is the hot
        path, not the data)."""
        for v in self.versions():
            if v < start:
                continue
            if upto is not None and v > upto:
                break
            yield self.read_entry(v)

    def latest_checkpoint_version(self, upto: int | None = None) -> int | None:
        best = None
        for name in self.io.listdir(self.metadata_dir):
            m = _CHECKPOINT_RE.match(name)
            if m:
                v = int(m.group(1))
                if (upto is None or v <= upto) and (best is None or v > best):
                    best = v
        return best

    def state_at(self, version: int | None = None) -> dict[str, FileInfo]:
        """Live file set (path -> FileInfo) at `version` (default: latest),
        replaying from the newest checkpoint at or before it."""
        if version is None:
            version = self.latest_version()
        if version is None:
            return {}
        cached = self._state_cache.get(version)
        if cached is not None:
            return dict(cached)
        state: dict[str, FileInfo] = {}
        start = 0
        cp = self.latest_checkpoint_version(upto=version)
        if cp is not None:
            cp_raw = json.loads(self.io.read_text(os.path.join(self.metadata_dir, f"checkpoint-{cp:010d}.json")))
            state = {fi["path"]: FileInfo(**fi) for fi in cp_raw["files"]}
            start = cp + 1
        saw_pending_txn = False
        for entry in self.entries_range(start, upto=version):
            if not self.in_main_lineage(entry):
                # outside the main lineage: write-audit-publish stage
                # (until published), branch commit (until merged), or
                # transaction entry whose marker isn't committed. A
                # PENDING transaction may still commit and retro-apply
                # at this version — the resolved state is not final, so
                # it must not be memoized.
                saw_pending_txn = saw_pending_txn or (
                    (entry.extra or {}).get("txn") is not None
                    and self.txn_status(entry.extra["txn"]) == "pending"
                )
                continue
            for p in entry.removed_files:
                state.pop(p, None)
            for fi in entry.added_files:
                state[fi.path] = fi
        if not saw_pending_txn:
            while len(self._state_cache) >= 8:
                self._state_cache.pop(next(iter(self._state_cache)))
            self._state_cache[version] = dict(state)
        return state

    def _read_checkpoint(self, version: int | None = None) -> dict | None:
        cp = self.latest_checkpoint_version(upto=version)
        if cp is None:
            return None
        return json.loads(self.io.read_text(os.path.join(self.metadata_dir, f"checkpoint-{cp:010d}.json")))

    def properties_at(self, version: int | None = None) -> dict[str, str]:
        """Property map at `version`: each property-bearing entry
        carries the FULL map, so the newest one wins. When no surviving
        entry carries properties (expiry removed them), the newest
        checkpoint at or before `version` supplies them — checkpoints
        snapshot properties exactly so expiry can't reset a table to
        defaults.

        The reverse scan STOPS at the newest checkpoint (r16):
        anything below it is frozen in the checkpoint's own property
        snapshot, so reading those entry files is pure O(all versions)
        IO — this runs on every write (target size / distribution mode
        lookup) and inside the orphan sweep's gc gate."""
        cpv = self.latest_checkpoint_version(upto=version)
        vs = self.versions()
        if version is not None:
            vs = [v for v in vs if v <= version]
        for v in reversed(vs):
            if cpv is not None and v <= cpv:
                break
            entry = self.read_entry(v)
            if not self.in_main_lineage(entry):
                continue  # only main-lineage entries define metadata
            if entry.properties is not None:
                return dict(entry.properties)
        cp = self._read_checkpoint(version)
        if cp is not None:
            return dict(cp.get("properties") or {})
        # no main-lineage metadata at all: a table CREATED ON a catalog
        # branch (catalog_refs.create_table) carries its properties on
        # the branch-tagged create entry until the merge publishes them
        # — branch writes must already honor them (e.g. target file
        # size). Main-facing paths never reach here: the catalog treats
        # a no-main-lineage table as nonexistent on main.
        for entry in reversed(self.entries(upto=version)):
            if entry.properties is not None:
                return dict(entry.properties)
        return {}

    def renames_upto(self, version: int | None = None) -> list[dict]:
        """Ordered column-rename history at `version`: [{"version",
        "from", "to"}, ...] — the name-mapping layer (Iceberg's
        `schema.name-mapping.default` analog) that lets files written
        before a RENAME COLUMN resolve their old physical names to the
        current schema. Replay starts from the newest checkpoint at or
        before `version` (checkpoints snapshot the cumulative list, so
        expiring the rename commit itself can't orphan old files'
        physical names) plus the surviving suffix entries."""
        if version is None:
            version = self.latest_version()
        if version is None:
            return []
        out: list[dict] = []
        start = 0
        cp = self.latest_checkpoint_version(upto=version)
        if cp is not None:
            cp_raw = self._read_checkpoint(version)
            out = list(cp_raw.get("renames") or [])
            start = cp + 1
        for entry in self.entries_range(start, upto=version):
            if not self.in_main_lineage(entry):
                continue
            r = (entry.extra or {}).get("rename")
            if r:
                out.append({"version": entry.version, "from": r["from"], "to": r["to"]})
        return out

    def drops_upto(self, version: int | None = None) -> list[dict]:
        """Column-drop history at `version`: [{"version", "name"},
        ...] — the other half of the name-mapping layer. A column
        dropped and later RE-ADDED under the same name must read as
        null from files that predate the drop (they physically carry
        the dead lineage's bytes; Iceberg's field IDs give null there,
        and name resolution must too). Checkpoint-carried like the
        rename history so expiry can't lose it."""
        if version is None:
            version = self.latest_version()
        if version is None:
            return []
        out: list[dict] = []
        start = 0
        cp = self.latest_checkpoint_version(upto=version)
        if cp is not None:
            cp_raw = self._read_checkpoint(version)
            out = list(cp_raw.get("drops") or [])
            start = cp + 1
        for entry in self.entries_range(start, upto=version):
            if not self.in_main_lineage(entry):
                continue
            d = (entry.extra or {}).get("dropped")
            if d:
                out.append({"version": entry.version, "name": d})
        return out

    def schema_ddl_at(self, version: int | None = None) -> str | None:
        """Schema DDL recorded at `version`: newest schema-bearing entry
        wins; falls back to the newest checkpoint (which snapshots the
        schema so expiring the commit that recorded it — a create /
        add_column / evolving append — can't silently drop evolved
        columns). Reverse scan stops at the newest checkpoint, same
        O(suffix) rule as properties_at."""
        cpv = self.latest_checkpoint_version(upto=version)
        vs = self.versions()
        if version is not None:
            vs = [v for v in vs if v <= version]
        for v in reversed(vs):
            if cpv is not None and v <= cpv:
                break
            entry = self.read_entry(v)
            if not self.in_main_lineage(entry):
                continue  # branch/stage/uncommitted-txn entries cannot evolve the schema
            if entry.extra and entry.extra.get("schema"):
                return entry.extra["schema"]
        cp = self._read_checkpoint(version)
        if cp is not None:
            return cp.get("schema")
        # branch-created table (no main lineage anywhere): its schema
        # lives on the branch-tagged create entry — see properties_at
        for entry in reversed(self.entries(upto=version)):
            if entry.extra and entry.extra.get("schema"):
                return entry.extra["schema"]
        return None

    # ---- writing -----------------------------------------------------

    def append(self, make_entry, branch: str | None = None) -> LogEntry:
        """Atomically commit the entry produced by `make_entry(version)`.

        `make_entry` is re-invoked on version conflict so the caller can
        re-resolve against the new latest state (optimistic concurrency).

        `branch` — commit onto a named branch ref instead of main
        (Nessie's write-on-ref; the reference stack's
        `spark.sql.catalog.nessie.ref` knob). The entry lands in the
        SAME total-ordered log (one global version sequence arbitrated
        by the same O_EXCL primitive, so cross-branch races still
        serialize) tagged `extra.branch = <name>`, which every
        main-lineage fold skips; the branch ref's head then advances to
        it. Main stays byte-identical until merge_branch.
        """
        if branch is not None:
            ref = self.refs().get(branch)
            if ref is None:
                raise ValueError(f"branch {branch!r} does not exist")
            if ref["kind"] != "branch":
                raise ValueError(f"ref {branch!r} is a tag — tags are immutable")
        while True:
            latest = self.latest_version()
            version = 0 if latest is None else latest + 1
            entry: LogEntry = make_entry(version)
            if branch is not None:
                entry = _dc_replace(
                    entry, extra={**(entry.extra or {}), "branch": branch}
                )
            tx = (entry.extra or {}).get("txn")
            if tx is not None:
                # intent-before-stage: the pending-claims guard's
                # short-circuit relies on staged-pending ⇒ intent-present
                # (see pending_txn_removed_claims). Created here, at the
                # single chokepoint every staged entry passes through.
                self._ensure_txn_intent(tx)
            raw = asdict(entry)
            raw["added_files"] = [asdict(fi) for fi in entry.added_files]
            raw["removed_files"] = list(entry.removed_files)
            path = os.path.join(self.metadata_dir, f"{version:010d}.json")

            def _slot_above_checkpoint_floor(version=version):
                # Snapshot expiry deletes entry files at or below a
                # checkpoint it writes FIRST — freeing their names for
                # O_EXCL re-claim. A writer that chose `version` from a
                # listing and then stalled (mutex wait, descheduling)
                # could otherwise win a freed slot and commit BELOW the
                # table head, where every checkpoint-anchored fold
                # silently skips it: a lost commit (r17; reproduced by
                # tests/test_flock_mutex.py ingest-vs-maintenance under
                # load). Checkpoints are never deleted, so "freed slot"
                # implies "newest checkpoint >= slot" forever — checking
                # the floor at write time (inside the arbiter's per-path
                # hold, which entry removal also takes) makes the claim
                # safe. In normal operation head claims are always above
                # the floor, so this never rejects a live head commit.
                cp = self.latest_checkpoint_version()
                return cp is None or version > cp

            if self.io.create_exclusive_guarded(
                path, json.dumps(raw, indent=1), _slot_above_checkpoint_floor
            ):
                if branch is not None:
                    self._advance_branch(branch, version)
                return entry
            continue  # lost the race: recompute against new latest

    # ---- branch lineage (Nessie write-on-ref analog) ------------------

    def branch_info(self, name: str) -> tuple[int, int, list[int]]:
        """(base, head, branch_commit_versions) for a branch ref.

        base = the main-lineage snapshot the branch forked from (the
        ref's recorded `base`, defaulting to its pointer for a branch
        with no commits yet); head = the ref pointer; the commit list
        is the ref's EXPLICIT `commits` list — the replay chain,
        recorded commit-by-commit under the ref lock. Selecting by tag
        name over (base, head] instead would resurrect stale commits
        after a rewind (update_ref back past them) or a drop/re-create
        of the same branch name, because those entries stay in the
        append-only log; the explicit list makes the chain exactly
        what this incarnation of the branch committed."""
        ref = self.refs().get(name)
        if ref is None:
            raise ValueError(f"ref {name!r} does not exist")
        if ref["kind"] != "branch":
            raise ValueError(f"ref {name!r} is a tag, not a branch")
        head = ref["snapshot_id"]
        base = ref.get("base", head)
        chain = sorted(ref.get("commits", []))
        return base, head, chain

    def state_at_branch(self, name: str) -> dict[str, FileInfo]:
        """Live file set on a branch: main state folded to the fork
        base, then the branch's own commits replayed in version order.

        Chain files fold with a FUTURE data sequence number — the same
        projection the write-audit-publish AUDIT read applies to stage
        snapshots (table.py `read(version=)`), and for the same reason:
        merge_branch re-stamps added files to the merge version (branch
        rows enter the main lineage at merge), so an equality delete
        sitting in the folded base must NOT gate chain rows in the
        branch READ either, or the read and the eventual merge would
        disagree. Without this, rebasing a branch across a main
        equality-delete commit made the rebased read tombstone chain
        rows that the merge then resurrected (caught by
        tests/test_branches.py's rebase-across-eq-delete case). The
        write-time name_epoch is pinned before seq is overridden —
        rename/drop name mapping keys on the PHYSICAL write schema and
        must never follow a visibility re-stamp (log.py:545 rule)."""
        base, _head, chain = self.branch_info(name)
        state = self.state_at(base)
        for v in chain:
            entry = self.read_entry(v)
            for p in entry.removed_files:
                state.pop(p, None)
            for fi in entry.added_files:
                state[fi.path] = _dc_replace(
                    fi,
                    seq=1 << 62,
                    name_epoch=fi.name_epoch if fi.name_epoch is not None else fi.seq,
                )
        return state

    def _with_ref_lock(self, name: str, fn):
        """Run `fn` holding an exclusive per-ref advisory lock.

        Read-modify-write of a ref file (head + commits list) is not
        atomic on its own: two branch commits racing the update could
        each read the old ref and the second writer would drop the
        first's commit from the list. The lock file is created with the
        same O_EXCL primitive as commits, turning the update into an
        effective compare-and-swap on POSIX/HDFS. A lock older than 60 s
        is presumed abandoned (crashed writer) and stolen. On raw S3
        create-exclusive is check-then-put — same documented caveat as
        the commit arbiter (fs.py): pair with a catalog service there."""
        lock = self._ref_path(name) + ".lock"
        deadline = _time.monotonic() + 30.0
        while not self.io.create_exclusive(lock, str(os.getpid())):
            try:
                if _time.time() - self.io.mtime(lock) > LOCK_STEAL_SECONDS:
                    self.io.remove(lock)
                    continue
            except OSError:
                continue  # lock vanished between create and mtime
            if _time.monotonic() >= deadline:
                raise RuntimeError(f"timed out waiting for ref lock on {name!r}")
            _time.sleep(0.01)
        try:
            return fn()
        finally:
            try:
                self.io.remove(lock)
            except OSError:
                pass

    def _advance_branch(self, name: str, new_head: int) -> None:
        """Record a just-committed branch entry on its ref: append the
        version to the ref's explicit `commits` chain and advance the
        head to the largest recorded commit. Runs under the ref lock so
        two racing branch commits both land in the chain regardless of
        the order their ref updates apply."""

        def update():
            ref = self.refs().get(name)
            if ref is None:
                raise ValueError(f"branch {name!r} vanished mid-commit")
            base = ref.get("base", ref["snapshot_id"])
            commits = sorted(set(ref.get("commits", [])) | {new_head})
            raw = {
                "name": name,
                "snapshot_id": max(ref["snapshot_id"], commits[-1]),
                "kind": "branch",
                "base": base,
                "commits": commits,
            }
            self.io.write_text_atomic(self._ref_path(name), json.dumps(raw))

        self._with_ref_lock(name, update)

    def reanchor_branch(self, name: str, new_base: int, merged: set[int]) -> dict:
        """Post-merge ref update: re-anchor the branch at the merge
        commit, dropping exactly the MERGED chain commits and keeping
        any branch commit that raced in after the merge captured its
        chain — update_ref's blank reset would silently orphan such a
        commit from the branch. Kept commits replay coherently over the
        new base: the merge re-adds the chain's files under their
        original paths, so a racer's adds/removals still resolve. Runs
        under the ref lock (same CAS discipline as _advance_branch)."""

        def update():
            ref = self.refs().get(name)
            if ref is None:
                raise ValueError(f"branch {name!r} vanished mid-merge")
            kept = sorted(set(ref.get("commits", [])) - set(merged))
            raw = {
                "name": name,
                "snapshot_id": max([new_base, *kept]),
                "kind": "branch",
                "base": new_base,
                "commits": kept,
            }
            self.io.write_text_atomic(self._ref_path(name), json.dumps(raw))
            return raw

        return self._with_ref_lock(name, update)

    def rebase_ref(self, name: str, new_base: int, plan=None) -> dict:
        """Re-anchor a branch at `new_base` KEEPING its commit chain —
        the ref-level half of rebase_branch (maintenance.py).

        Unlike update_ref (which resets the chain: "branch = exactly
        main-as-of-N"), rebasing moves only the fork base: branch state
        stays main-folded-to-base + chain, so the same commits re-apply
        over the new base by the ordinary fold — no log entries are
        rewritten, and every file keeps its original seq/name_epoch
        stamps (replay paths must never re-stamp name_epoch).

        `plan(ref) -> kept_commits` runs INSIDE the ref lock with the
        current ref dict, so replay validation and conflict-dropping
        can't race a concurrent branch commit: a commit that lands
        after plan() was computed would be lost if the chain were
        captured outside the lock (same discipline as reanchor_branch).
        plan raises (e.g. CommitConflictError) to refuse the rebase."""
        self._check_ref_target(new_base)

        def update():
            ref = self.refs().get(name)
            if ref is None:
                raise ValueError(f"ref {name!r} does not exist")
            if ref["kind"] != "branch":
                raise ValueError(f"ref {name!r} is a tag — tags are immutable")
            commits = sorted(ref.get("commits", []))
            if plan is not None:
                commits = sorted(plan(ref))
            raw = {
                "name": name,
                "snapshot_id": max([new_base, *commits]),
                "kind": "branch",
                "base": new_base,
                "commits": commits,
            }
            self.io.write_text_atomic(self._ref_path(name), json.dumps(raw))
            return raw

        return self._with_ref_lock(name, update)

    def write_checkpoint(self, version: int | None = None) -> int:
        """Materialize resolved state at `version` (default latest) —
        our `rewrite_manifests` (SURVEY.md §2.10 M2).

        Clamped below the earliest PENDING transaction entry: a
        checkpoint freezes the fold, and a pending multi-table txn that
        later commits must retro-apply at its own version — a
        checkpoint past it would silently drop the committed txn's
        files from every replay. (Committed/aborted txn entries are
        final and checkpoint normally.)"""
        if version is None:
            version = self.latest_version()
        if version is None:
            raise ValueError("cannot checkpoint an empty log")
        # pending entries always sit above the newest existing
        # checkpoint (this very clamp guarantees it inductively), so
        # the scan starts there — O(suffix) entry reads, not O(all)
        prev_cp = self.latest_checkpoint_version(upto=version)
        for e in self.entries_range(0 if prev_cp is None else prev_cp + 1, upto=version):
            tx = (e.extra or {}).get("txn")
            if tx is not None and self.txn_status(tx) == "pending":
                if e.version == 0:
                    raise ValueError(
                        "cannot checkpoint: transaction pending at version 0"
                    )
                version = e.version - 1
                break
        state = self.state_at(version)
        referenced, max_stamp = self._referenced_upto(version)
        path = os.path.join(self.metadata_dir, f"checkpoint-{version:010d}.json")
        self.io.write_text_atomic(
            path,
            json.dumps(
                {
                    "version": version,
                    "files": [asdict(fi) for fi in state.values()],
                    # schema + properties + rename history ride along so
                    # log entries can be expired without losing table
                    # metadata (renames: old files' physical names must
                    # stay resolvable forever)
                    "schema": self.schema_ddl_at(version),
                    "properties": self.properties_at(version),
                    "renames": self.renames_upto(version),
                    "drops": self.drops_upto(version),
                    # cumulative orphan-sweep protection set (r16): every
                    # file path reachable at ANY version <= here (time
                    # travel) or added by a stage/branch/txn entry <=
                    # here, carried forward checkpoint-to-checkpoint so
                    # remove_orphan_files folds only the suffix instead
                    # of O(all versions) of state replays per sweep.
                    # expire_snapshots subtracts the paths it deletes
                    # (see its refresh step).
                    "referenced": sorted(referenced),
                    # newest writer-clock stamp frozen at/below this
                    # checkpoint: the orphan sweep's clock-skew tripwire
                    # includes it so future-stamped evidence can't hide
                    # under a checkpoint (r16, ADVICE)
                    "max_committed_at": max_stamp,
                }
            ),
        )
        return version

    def _checkpoint_versions(self) -> list[int]:
        out = []
        for name in self.io.listdir(self.metadata_dir):
            m = _CHECKPOINT_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _referenced_upto(self, version: int) -> tuple[set[str], float]:
        """(cumulative referenced-path set, newest committed_at stamp)
        over everything at or below `version`.

        Incremental when the newest prior checkpoint carries the
        `referenced` field: seed from it and fold only the entries
        above it — O(suffix). Otherwise (first checkpoint after the
        r16 upgrade, or a pre-upgrade chain) derive the full set: every
        prior checkpoint's resolved file list (covers files whose
        adding entries were expired — they are still reachable at the
        checkpointed versions) plus every surviving entry's added
        files, which is exactly the union remove_orphan_files used to
        recompute per sweep (any-lineage adds subsume both the
        per-version state union and the stage/branch/txn protection
        loop)."""
        referenced: set[str] = set()
        max_stamp = 0.0
        start_v = 0
        priors = [v for v in self._checkpoint_versions() if v < version]
        prior_raw = None
        if priors:
            prior_raw = json.loads(
                self.io.read_text(
                    os.path.join(
                        self.metadata_dir, f"checkpoint-{priors[-1]:010d}.json"
                    )
                )
            )
        if prior_raw is not None and "referenced" in prior_raw:
            referenced.update(prior_raw["referenced"])
            max_stamp = float(prior_raw.get("max_committed_at") or 0.0)
            start_v = prior_raw["version"] + 1
        else:
            for cv in priors:
                cp_raw = json.loads(
                    self.io.read_text(
                        os.path.join(self.metadata_dir, f"checkpoint-{cv:010d}.json")
                    )
                )
                referenced.update(fi["path"] for fi in cp_raw["files"])
        for e in self.entries_range(start_v, upto=version):
            referenced.update(fi.path for fi in e.added_files)
            max_stamp = max(max_stamp, e.committed_at)
        return referenced, max_stamp

    def subtract_referenced(self, paths: set[str]) -> None:
        """Drop `paths` from the NEWEST checkpoint's cumulative
        `referenced` set — expire_snapshots calls this after deleting
        the files only expired snapshots referenced, so the carried-
        forward protection set doesn't shield deleted paths forever
        (the orphan sweep reads only the newest checkpoint's set, and
        later checkpoints seed from it). No-op when no checkpoint
        carries the field."""
        cps = self._checkpoint_versions()
        if not cps:
            return
        path = os.path.join(self.metadata_dir, f"checkpoint-{cps[-1]:010d}.json")
        raw = json.loads(self.io.read_text(path))
        if "referenced" not in raw:
            return
        kept = [p for p in raw["referenced"] if p not in paths]
        if len(kept) != len(raw["referenced"]):
            raw["referenced"] = kept
            self.io.write_text_atomic(path, json.dumps(raw))

    def remove_entries(self, versions: list[int]) -> None:
        for v in versions:
            self._entry_cache.pop(v, None)
            p = os.path.join(self.metadata_dir, f"{v:010d}.json")
            if self.io.exists(p):
                # arbitrated: freeing a slot name must serialize with
                # commit claims on the same name (see append's
                # checkpoint-floor precondition — the r17 lost-commit
                # race closure)
                self.io.remove_arbitrated(p)

    # ---- named refs (branches/tags) ----------------------------------
    # The reference stack gets git-like refs from Nessie (its
    # spark-defaults pin `ref=main`); we model the same as named
    # snapshot pointers stored next to the log: `metadata/ref-<name>.json`
    # = {"name", "snapshot_id", "kind"}. Branches are movable pointers,
    # tags immutable — exactly Iceberg's branch/tag refs. The files are
    # created with the same O_EXCL primitive as commits, so two writers
    # racing to create a ref cannot both win.

    def _ref_path(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9._-]+", name):
            raise ValueError(f"invalid ref name {name!r}")
        return os.path.join(self.metadata_dir, f"ref-{name}.json")

    def refs(self) -> dict[str, dict]:
        out = {}
        for fname in self.io.listdir(self.metadata_dir):
            m = _REF_RE.match(fname)
            if m:
                raw = json.loads(
                    self.io.read_text(os.path.join(self.metadata_dir, fname))
                )
                out[raw["name"]] = raw
        return out

    def _check_ref_target(self, snapshot_id: int) -> None:
        if snapshot_id not in self.versions():
            raise ValueError(f"snapshot {snapshot_id} does not exist (expired?)")
        entry = self.read_entry(snapshot_id)
        if entry.operation == "stage":
            raise ValueError(
                f"snapshot {snapshot_id} is an unpublished stage snapshot — "
                "refs may only point at main-lineage snapshots"
            )
        if entry.extra and entry.extra.get("branch"):
            raise ValueError(
                f"snapshot {snapshot_id} is a branch commit (on "
                f"{entry.extra['branch']!r}) — refs may only be created at / "
                "re-anchored to main-lineage snapshots; branch heads advance "
                "through branch commits themselves"
            )
        tx = (entry.extra or {}).get("txn")
        if tx is not None and self.txn_status(tx) != "committed":
            raise ValueError(
                f"snapshot {snapshot_id} belongs to {self.txn_status(tx)} "
                f"transaction {tx!r} — refs may only point at main-lineage "
                "snapshots"
            )

    def create_ref(
        self,
        name: str,
        snapshot_id: int,
        kind: str = "branch",
        allow_empty: bool = False,
    ) -> dict:
        if kind not in ("branch", "tag"):
            raise ValueError(f"ref kind must be branch or tag, got {kind!r}")
        if snapshot_id == -1 and allow_empty:
            # virtual pre-create root: a branch for a table CREATED ON
            # the branch (catalog-branch DDL) forks at "before any
            # commit" — state folds to empty at base -1 and the chain
            # carries everything, starting with the create entry itself.
            # Only branches make sense here (a tag of nothing is
            # nothing), and only internal callers pass allow_empty.
            if kind != "branch":
                raise ValueError("only a branch may anchor at the empty root")
        else:
            self._check_ref_target(snapshot_id)
        raw = {"name": name, "snapshot_id": snapshot_id, "kind": kind}
        if kind == "branch":
            # fork point + explicit (initially empty) commit chain —
            # see branch_info for why the chain is explicit
            raw["base"] = snapshot_id
            raw["commits"] = []
        if not self.io.create_exclusive(self._ref_path(name), json.dumps(raw)):
            raise ValueError(f"ref {name!r} already exists")
        return raw

    def update_ref(self, name: str, snapshot_id: int) -> dict:
        """Re-anchor a BRANCH pointer at a main-lineage snapshot
        (advance or rewind); tags are immutable.

        Re-anchoring resets the branch's fork base to the target and
        CLEARS its commit chain: pointing a branch at main snapshot N
        means "this branch is now exactly main-as-of-N". Any branch
        commits the old chain held are abandoned — they stay in the
        append-only log (expire_snapshots reclaims them once no live
        ref lists them) but can never resurface in branch_info, because
        the chain is the ref's explicit list, not a tag scan."""
        cur = self.refs().get(name)
        if cur is None:
            raise ValueError(f"ref {name!r} does not exist")
        if cur["kind"] != "branch":
            raise ValueError(f"ref {name!r} is a tag — tags are immutable")
        self._check_ref_target(snapshot_id)
        raw = {
            "name": name,
            "snapshot_id": snapshot_id,
            "kind": "branch",
            "base": snapshot_id,
            "commits": [],
        }
        self._with_ref_lock(
            name,
            lambda: self.io.write_text_atomic(self._ref_path(name), json.dumps(raw)),
        )
        return raw

    def delete_ref(self, name: str) -> None:
        p = self._ref_path(name)
        if not self.io.exists(p):
            raise ValueError(f"ref {name!r} does not exist")
        self.io.remove(p)

    def resolve_ref(self, name: str) -> int:
        ref = self.refs().get(name)
        if ref is None:
            raise ValueError(f"ref {name!r} does not exist")
        return ref["snapshot_id"]
