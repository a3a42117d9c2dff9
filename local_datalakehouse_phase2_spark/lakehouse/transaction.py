"""Multi-table atomic transactions (SURVEY.md §2.9).

The reference stack's catalog is Nessie
(/root/reference/docker-compose.yml:6), whose git-like global commit
lets one commit span tables: a pipeline that updates `orders` AND its
downstream aggregate publishes both with a single catalog pointer
swap. Our transaction log is per-table, so the same guarantee is
re-expressed as two-phase staging with ONE atomic visibility flip:

1. STAGE — each `txn.append/overwrite(table, df)` writes its data
   files and commits a normal log entry tagged `extra.txn = <id>`.
   Tagged entries are outside every main-lineage fold while the txn is
   undecided (see TransactionLog.in_main_lineage), so readers of any
   member table see nothing. Each staging commit still runs the
   standard per-table conflict validation — a stale overwrite fails
   fast at stage time.
2. COMMIT — after re-validating every staged entry against its
   table's CURRENT main state (removed files still live, added files
   not already live, no new files under a staged overwrite), the
   marker `<warehouse>/.txns/<id>.json` is created with O_EXCL and
   status "committed". That single create is the atomic point: the
   moment it exists, every member entry is part of its table's main
   lineage at its original version. If validation fails, the marker is
   created with status "aborted" instead — nothing on ANY table
   publishes, and the decision is final (the same O_EXCL arbitration
   as commits, so a racing commit()/abort() resolves to one winner).

Scale/deployment note: the marker create is atomic on POSIX/HDFS; on
raw S3 it is check-then-put — the same documented caveat as the
per-table commit arbiter (fs.py), resolved in production by fronting
the marker dir with a catalog service, exactly Iceberg's guidance.
The window between commit-time validation and the marker create is
the check-then-put gap of that primitive; per-table writers racing
into exactly that window are not re-validated. Single-node scope
documented in SURVEY.md §4.

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

from pyspark.sql import DataFrame

from .log import CommitConflictError
from .table import LakehouseTable


class TransactionError(RuntimeError):
    pass


class Transaction:
    """Created by `Lakehouse.transaction()`. Stage writes on member
    tables, then `commit()` (all-or-nothing) or `abort()`."""

    def __init__(self, lake, txn_id: str | None = None):
        self.lake = lake
        self.txn_id = txn_id or f"txn-{uuid.uuid4().hex[:16]}"
        self.txn_dir = os.path.join(lake.warehouse_dir, ".txns")
        # (table, staged LogEntry, operation) in staging order
        self._staged: list[tuple[LakehouseTable, object, str]] = []
        self._decided: str | None = None

    # ---- staging -------------------------------------------------------

    def _check_open(self):
        if self._decided is not None:
            raise TransactionError(
                f"transaction {self.txn_id} already {self._decided}"
            )

    def _table(self, identifier: str) -> LakehouseTable:
        t = self.lake.table(identifier)
        if any(s.identifier == t.identifier for s, _, _ in self._staged):
            raise TransactionError(
                f"transaction {self.txn_id} already staged a write on "
                f"{identifier} — one write per table per transaction"
            )
        return t

    def append(self, identifier: str, df: DataFrame) -> None:
        """Stage an append on `identifier`. Schema evolution is
        rejected: evolved schema metadata is newest-wins on the main
        lineage, and an undecided entry must not define main metadata
        (same rule as write-audit-publish staging and branch writes)."""
        self._check_open()
        t = self._table(identifier)
        aligned, schema_ddl = t._align_for_write(df)
        if schema_ddl and t.schema() is not None:
            raise TransactionError(
                "a transactional write cannot evolve the table schema; "
                "evolve on main first, then stage"
            )
        entry = t._commit_write(
            aligned, operation="append", removed=(), extra={"txn": self.txn_id}
        )
        self._staged.append((t, entry, "append"))

    def overwrite(self, identifier: str, df: DataFrame) -> None:
        """Stage a full overwrite on `identifier`: the staged entry
        removes the files live at STAGE time. commit() re-validates
        that no other files appeared since — a concurrent append to an
        overwritten table is a serialization conflict (the overwrite
        claimed the whole table), mirroring `_commit_write`'s
        no-new-files-in-touched rule for partition overwrites."""
        self._check_open()
        t = self._table(identifier)
        aligned, schema_ddl = t._align_for_write(df)
        if schema_ddl and t.schema() is not None:
            raise TransactionError(
                "a transactional write cannot evolve the table schema; "
                "evolve on main first, then stage"
            )
        removed = tuple(sorted(t.log.state_at().keys()))
        entry = t._commit_write(
            aligned,
            operation="overwrite",
            removed=removed,
            extra={"txn": self.txn_id},
        )
        self._staged.append((t, entry, "overwrite"))

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
                "tables": [t.identifier for t, _, _ in self._staged],
                "entries": {
                    t.identifier: e.version for t, e, _ in self._staged
                },
            }
        )
        if io.create_exclusive(path, payload):
            decided = status
        else:
            decided = json.loads(io.read_text(path)).get("status", "pending")
        self._decided = decided
        return decided

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
            for t, entry, op in sorted(
                self._staged, key=lambda s: s[0].identifier
            ):
                live = t.log.state_at()
                gone = [p for p in entry.removed_files if p not in live]
                if gone:
                    raise CommitConflictError(
                        f"txn {self.txn_id} on {t.identifier}: {len(gone)} "
                        f"file(s) this transaction removes are no longer live "
                        f"(e.g. {gone[0]!r}) — a concurrent commit replaced "
                        "them; the whole transaction aborts"
                    )
                clash = [fi.path for fi in entry.added_files if fi.path in live]
                if clash:
                    raise CommitConflictError(
                        f"txn {self.txn_id} on {t.identifier}: staged file "
                        f"already live (e.g. {clash[0]!r}) — already committed?"
                    )
                if op == "overwrite":
                    new_files = [
                        p
                        for p, fi in live.items()
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
        except CommitConflictError:
            decided = self._write_marker("aborted")
            if decided == "committed":  # a racing commit() won first
                return self._result("committed")
            raise
        decided = self._write_marker("committed")
        if decided != "committed":
            raise TransactionError(
                f"transaction {self.txn_id} was aborted by a racing decision"
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
            "tables": sorted(t.identifier for t, _, _ in self._staged),
        }
