"""Multi-table atomic transactions (SURVEY.md §2.9).

The reference stack's catalog is Nessie
(/root/reference/docker-compose.yml:6), whose git-like global commit
lets one commit span tables: a pipeline that updates `orders` AND its
downstream aggregate publishes both with a single catalog pointer
swap. Our transaction log is per-table, so the same guarantee is
re-expressed as two-phase staging with ONE atomic visibility flip:

1. STAGE — each `txn.append/overwrite/delete_where/update_where`
   writes its data files and commits a normal log entry tagged
   `extra.txn = <id>`. Tagged entries are outside every main-lineage
   fold while the txn is undecided (see TransactionLog.in_main_lineage),
   so readers of any member table see nothing. Each staging commit
   still runs the standard per-table conflict validation — against
   main-visible state PLUS this transaction's own earlier staged
   entries on the same table, so a second write on a table sees the
   first (an overwrite after an append removes the append's files too).
2. COMMIT — after re-validating every staged entry, in version order
   per table, against its table's CURRENT main state with earlier
   member entries folded in (removed files still live, added files not
   already live, no new files under a staged overwrite, delete-file
   set unchanged under a staged row-level rewrite), the marker
   `<warehouse>/.txns/<id>.json` is created with O_EXCL and status
   "committed". That single create is the atomic point: the moment it
   exists, every member entry is part of its table's main lineage at
   its original version. If validation fails, the marker is created
   with status "aborted" instead — nothing on ANY table publishes, and
   the decision is final (the same O_EXCL arbitration as commits, so a
   racing commit()/abort() resolves to one winner).

Write shapes supported per table within one transaction:
- any number of appends/overwrites, applied in staging order (the fold
  replays member entries at their log versions);
- at most ONE row-level op (`delete_where` / `update_where`), and it
  must be the FIRST staged write on that table: row-level ops plan
  their rewrite from the table's pre-transaction state (they read real
  files; staged-but-invisible rows cannot be read back), so a
  row-level op after another staged write on the same table would
  silently ignore that write's rows — rejected up front instead.
  Copy-on-write only, for the same reason branch row-level ops are:
  merge-on-read tombstones would need their own visibility-deferred
  sequence lineage (the rows they tombstone must exist when the
  marker flips, with the tombstone's seq still ordering after them).

Scale/deployment note: the marker create is atomic on POSIX/HDFS; on
raw S3 it is check-then-put — the same documented caveat as the
per-table commit arbiter (fs.py), resolved in production by fronting
the marker dir with a catalog service, exactly Iceberg's guidance.
The validate->marker-create window is closed (r14): staged txn
entries hold version slots, so a racing main commit re-validates
against a log that contains them, and on file overlap it decides the
pending txn aborted through the same O_EXCL marker create this
commit() uses — first committer wins, one atomic arbiter, exactly one
survivor (log.decide_txn, table._check_pending_txn_claims; directed
races in tests/test_r14_races.py). Single-node scope documented in
SURVEY.md §4.

Sequence semantics: staged files keep the data sequence numbers
stamped at stage time — the transaction serializes at its entries'
log positions, made visible later (an equality delete committed
after a member entry applies to it once visible). This differs from
write-audit-publish `publish_changes`, which REPLAYS files as a new
head commit; a transaction must not replay, because N replays on N
tables would be N separate commits — the very thing it exists to
avoid.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame

from .log import CommitConflictError, FileInfo, LogEntry
from .table import LakehouseTable


class TransactionError(RuntimeError):
    pass


@dataclass(frozen=True)
class _Staged:
    table: LakehouseTable
    entry: LogEntry
    op: str  # append | overwrite | delete | update
    # delete-file set at plan time for row-level rewrites; revalidated
    # at marker time (same rule as _commit_write's deletes_fingerprint,
    # deferred to the transaction's atomic point)
    fingerprint: tuple[str, ...] | None = None


class Transaction:
    """Created by `Lakehouse.transaction()`. Stage writes on member
    tables, then `commit()` (all-or-nothing) or `abort()`."""

    def __init__(self, lake, txn_id: str | None = None):
        self.lake = lake
        self.txn_id = txn_id or f"txn-{uuid.uuid4().hex[:16]}"
        self.txn_dir = os.path.join(lake.warehouse_dir, ".txns")
        self._staged: list[_Staged] = []
        self._decided: str | None = None

    # ---- staging -------------------------------------------------------

    def _check_open(self):
        if self._decided is not None:
            raise TransactionError(
                f"transaction {self.txn_id} already {self._decided}"
            )

    def _staged_for(self, t: LakehouseTable) -> list[_Staged]:
        return [s for s in self._staged if s.table.identifier == t.identifier]

    def _txn_state(self, t: LakehouseTable) -> dict[str, FileInfo]:
        """The table state THIS transaction sees: current main-visible
        state with the txn's own staged entries folded on top in
        version order — what a later staged write on the same table
        must plan and validate against."""
        state = t.log.state_at()
        for s in sorted(self._staged_for(t), key=lambda s: s.entry.version):
            for p in s.entry.removed_files:
                state.pop(p, None)
            for fi in s.entry.added_files:
                state[fi.path] = fi
        return state

    def _check_schema_static(self, t: LakehouseTable, df: DataFrame) -> DataFrame:
        aligned, schema_ddl = t._align_for_write(df)
        if schema_ddl and t.schema() is not None:
            raise TransactionError(
                "a transactional write cannot evolve the table schema; "
                "evolve on main first, then stage"
            )
        return aligned

    def append(self, identifier: str, df: DataFrame) -> None:
        """Stage an append on `identifier`. Schema evolution is
        rejected: evolved schema metadata is newest-wins on the main
        lineage, and an undecided entry must not define main metadata
        (same rule as write-audit-publish staging and branch writes)."""
        self._check_open()
        t = self.lake.table(identifier)
        aligned = self._check_schema_static(t, df)
        entry = t._commit_write(
            aligned, operation="append", removed=(), extra={"txn": self.txn_id}
        )
        self._staged.append(_Staged(t, entry, "append"))

    def overwrite(self, identifier: str, df: DataFrame) -> None:
        """Stage a full overwrite on `identifier`: the staged entry
        removes every file the TRANSACTION sees at stage time — main's
        live files plus this txn's own earlier staged files on the
        table (an overwrite after a staged append supersedes it).
        commit() re-validates that no other files appeared since — a
        concurrent append to an overwritten table is a serialization
        conflict (the overwrite claimed the whole table), mirroring
        `_commit_write`'s no-new-files-in-touched rule for partition
        overwrites."""
        self._check_open()
        t = self.lake.table(identifier)
        aligned = self._check_schema_static(t, df)
        removed = tuple(sorted(self._txn_state(t).keys()))
        entry = t._commit_write(
            aligned,
            operation="overwrite",
            removed=removed,
            extra={"txn": self.txn_id},
            # the staged removals include this txn's own (main-invisible)
            # files; plain state_at() validation would reject them
            validation_state=lambda: self._txn_state(t),
        )
        self._staged.append(_Staged(t, entry, "overwrite"))

    def _check_first_write(self, t: LakehouseTable, what: str) -> None:
        prior = self._staged_for(t)
        if prior:
            raise TransactionError(
                f"txn {self.txn_id}: {what} must be the first staged write "
                f"on {t.identifier} — row-level ops plan their rewrite from "
                f"the pre-transaction table state and cannot see this "
                f"transaction's earlier staged {prior[0].op}; reorder the "
                "transaction (row-level ops first), or apply the change to "
                "the DataFrame before staging it"
            )

    @staticmethod
    def _check_cow(mode: str | None, what: str) -> None:
        if mode not in (None, "copy-on-write"):
            raise TransactionError(
                f"merge-on-read {what} is not supported inside a "
                "transaction; use copy-on-write (the default here) or run "
                "it outside the transaction"
            )

    def delete_where(self, identifier: str, condition, mode: str | None = None) -> None:
        """Stage a row-level DELETE ... WHERE on `identifier`
        (copy-on-write: affected files rewrite without the matched
        rows). Must be the first staged write on the table — see module
        docstring. A condition matching no rows stages nothing (and the
        table does not join the transaction).

        Copy-on-write is FORCED here, overriding a table-level
        `write.delete.mode = merge-on-read` property: a MOR tombstone
        staged invisibly would need its sequence number to keep
        ordering after the rows it deletes once the marker flips —
        a visibility-deferred delete-file lineage this per-table log
        deliberately does not model (module docstring, "Write shapes").
        Passing `mode="merge-on-read"` explicitly is refused loudly
        rather than silently downgraded, so a caller who NEEDS
        tombstone economics (huge table, tiny delete) knows to run the
        MOR delete outside the transaction instead."""
        self._check_open()
        self._check_cow(mode, "DELETE")
        t = self.lake.table(identifier)
        self._check_first_write(t, "delete_where")
        fingerprint = t._deletes_fingerprint()
        entry = t.delete_where(
            condition, mode="copy-on-write", extra={"txn": self.txn_id}
        )
        if (entry.extra or {}).get("txn") == self.txn_id:
            self._staged.append(_Staged(t, entry, "delete", fingerprint))

    def update_where(
        self,
        identifier: str,
        assignments: dict[str, object],
        condition,
        mode: str | None = None,
    ) -> None:
        """Stage a row-level UPDATE ... SET ... WHERE on `identifier`
        (copy-on-write). Same first-write, no-match, forced-COW, and
        explicit-MOR-refusal rules as delete_where."""
        self._check_open()
        self._check_cow(mode, "UPDATE")
        t = self.lake.table(identifier)
        self._check_first_write(t, "update_where")
        fingerprint = t._deletes_fingerprint()
        entry = t.update_where(
            assignments, condition, mode="copy-on-write", extra={"txn": self.txn_id}
        )
        if (entry.extra or {}).get("txn") == self.txn_id:
            self._staged.append(_Staged(t, entry, "update", fingerprint))

    # ---- decide --------------------------------------------------------

    def _write_marker(self, status: str) -> str:
        """Create the marker with O_EXCL; returns the DECIDED status
        (ours, or the racing winner's)."""
        io = self.lake.io
        io.makedirs(self.txn_dir)
        path = os.path.join(self.txn_dir, f"{self.txn_id}.json")
        payload = json.dumps(
            {
                "txn": self.txn_id,
                "status": status,
                "decided_at": time.time(),
                "tables": sorted({s.table.identifier for s in self._staged}),
                "entries": {
                    # every member entry version, per table
                    ident: [
                        s.entry.version
                        for s in self._staged
                        if s.table.identifier == ident
                    ]
                    for ident in {s.table.identifier for s in self._staged}
                },
            }
        )
        if io.create_exclusive(path, payload):
            decided = status
        else:
            decided = json.loads(io.read_text(path)).get("status", "pending")
        self._decided = decided
        try:
            # retire the intent sentinel (created by log.append with the
            # first staged entry) so main commits' pending-claims guard
            # goes back to its zero-read short-circuit
            io.remove(os.path.join(self.txn_dir, f"{self.txn_id}.intent"))
        except OSError:
            pass
        return decided

    def _validate_table(self, t: LakehouseTable, staged: list[_Staged]) -> None:
        """Re-validate a member table's staged entries, in version
        order, against a ROLLING state that starts from the table's
        current main-visible files and folds each validated entry in —
        so an overwrite staged after an append correctly expects the
        append's files, and a main commit that raced in since staging
        surfaces as a conflict on the first entry it invalidates."""
        state = t.log.state_at()
        for s in sorted(staged, key=lambda s: s.entry.version):
            entry = s.entry
            gone = [p for p in entry.removed_files if p not in state]
            if gone:
                raise CommitConflictError(
                    f"txn {self.txn_id} on {t.identifier}: {len(gone)} "
                    f"file(s) this transaction removes are no longer live "
                    f"(e.g. {gone[0]!r}) — a concurrent commit replaced "
                    "them; the whole transaction aborts"
                )
            clash = [fi.path for fi in entry.added_files if fi.path in state]
            if clash:
                raise CommitConflictError(
                    f"txn {self.txn_id} on {t.identifier}: staged file "
                    f"already live (e.g. {clash[0]!r}) — already committed?"
                )
            if s.op == "overwrite":
                new_files = [
                    p
                    for p, fi in state.items()
                    if fi.content == 0 and p not in entry.removed_files
                ]
                if new_files:
                    raise CommitConflictError(
                        f"txn {self.txn_id} on {t.identifier}: "
                        f"{len(new_files)} data file(s) appeared since the "
                        f"overwrite was staged (e.g. {new_files[0]!r}) — "
                        "the staged overwrite would silently keep them; "
                        "the whole transaction aborts"
                    )
            if s.fingerprint is not None:
                now = t._deletes_fingerprint()
                if now != s.fingerprint:
                    raise CommitConflictError(
                        f"txn {self.txn_id} on {t.identifier}: the "
                        "delete-file set changed since the row-level "
                        f"{s.op} was planned (a concurrent merge-on-read "
                        "op or delete-file rewrite) — its rewrite would "
                        "drop or resurrect tombstones; the whole "
                        "transaction aborts"
                    )
            for p in entry.removed_files:
                state.pop(p, None)
            for fi in entry.added_files:
                state[fi.path] = fi

    def commit(self) -> dict:
        """Atomically publish every staged write, or nothing.

        Validation order is by table identifier (deterministic), all
        tables checked BEFORE the marker flips — a conflict on the last
        table aborts the stage on the first."""
        self._check_open()
        if not self._staged:
            self._decided = "committed"  # vacuous
            return {"txn": self.txn_id, "status": "committed", "tables": []}
        try:
            by_table: dict[str, list[_Staged]] = {}
            for s in self._staged:
                by_table.setdefault(s.table.identifier, []).append(s)
            for ident in sorted(by_table):
                self._validate_table(by_table[ident][0].table, by_table[ident])
        except CommitConflictError:
            decided = self._write_marker("aborted")
            if decided == "committed":  # a racing commit() won first
                return self._result("committed")
            raise
        decided = self._write_marker("committed")
        if decided != "committed":
            # NOTE the abort may be PESSIMISTIC: a racing main writer
            # decides an overlapping pending txn aborted while its own
            # make() attempt may still lose its slot, fail a later
            # validation, or crash before its entry lands — markers
            # decide once, so no conflicting main commit need be
            # visible afterwards. Acceptable under first-committer-wins
            # (the alternative reopens the validate->flip window);
            # operationally: re-staging the same work and retrying may
            # simply succeed.
            raise TransactionError(
                f"transaction {self.txn_id} was aborted by a racing decision "
                "(possibly pessimistic: the decider's own commit may not have "
                "survived — re-staging and retrying may succeed)"
            )
        return self._result("committed")

    def abort(self) -> dict:
        """Finalize as aborted: staged entries never become visible;
        expire_snapshots + the orphan sweep reclaim them later."""
        self._check_open()
        if not self._staged:
            self._decided = "aborted"
            return {"txn": self.txn_id, "status": "aborted", "tables": []}
        decided = self._write_marker("aborted")
        return self._result(decided)

    def _result(self, status: str) -> dict:
        return {
            "txn": self.txn_id,
            "status": status,
            "tables": sorted({s.table.identifier for s in self._staged}),
        }
