"""Catalog: namespaces + tables under a warehouse directory.

Re-expresses the reference's Nessie-backed catalog surface
(SURVEY.md §2.9) locally:

- CREATE NAMESPACE ... WITH PROPERTIES   /root/reference/SPARK_ICEBERG_GUIDE.md:89-90
- SHOW NAMESPACES / DESCRIBE NAMESPACE   :92-93
- CREATE TABLE ... TBLPROPERTIES(...)    :102-110
- SHOW TABLES / DESCRIBE TABLE           :114-115

Layout mirrors the reference's object-store warehouse
(`warehouse/<ns>/<table>_<uuid>/{data,metadata}` narrated at :117-118)
minus the uuid suffix — a local path per table with `data/` and
`metadata/` inside. Namespace properties live in a
`.namespace.json` sidecar (namespaces are metadata-only, :95-96).
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .fs import FileIO, LocalFileIO
from .log import LogEntry
from .table import LakehouseTable, _parse_ddl_cached

_NS_FILE = ".namespace.json"


class CatalogError(RuntimeError):
    pass


class Lakehouse:
    def __init__(self, spark: SparkSession, warehouse_dir: str, io: FileIO | None = None):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.io = io or LocalFileIO()
        self.io.makedirs(warehouse_dir)

    def transaction(self, txn_id: str | None = None):
        """Open a multi-table atomic transaction (see transaction.py):
        stage writes across tables, publish them with one atomic
        marker flip — the Nessie-catalog cross-table commit analog."""
        from .transaction import Transaction

        return Transaction(self, txn_id=txn_id)

    # ---- catalog-wide refs (the Nessie branch model; catalog_refs.py) --

    @property
    def _catalog_refs(self):
        from .catalog_refs import CatalogRefs

        return CatalogRefs(self)

    def create_branch(self, name: str) -> dict:
        """Fork a CATALOG-WIDE branch at the current state of every
        table — Nessie's git-like branch over the whole warehouse (the
        reference pins `spark.sql.catalog.nessie.ref=main`,
        /root/reference/spark/conf/spark-defaults.conf:9). Write many
        tables over many commits on it, then publish everything
        atomically with merge_catalog_branch."""
        return self._catalog_refs.create(name)

    def drop_branch(self, name: str) -> None:
        self._catalog_refs.drop(name)

    def create_tag(self, name: str) -> dict:
        """Pin the ENTIRE warehouse immutably at its current state —
        Nessie's catalog tag, the reproducible-training-run anchor:
        `read(identifier, catalog_ref=tag)` resolves every table at
        its pinned version forever; writes/merges on the tag refuse;
        expire_snapshots keeps the pinned snapshots readable."""
        return self._catalog_refs.create(name, kind="tag")

    def drop_tag(self, name: str) -> None:
        self._catalog_refs.drop(name)

    def catalog_branches(self) -> dict[str, dict]:
        return self._catalog_refs.list()

    def merge_catalog_branch(self, name: str) -> dict:
        """Atomically publish every table the branch wrote — all or
        nothing, one marker flip (see catalog_refs.py)."""
        return self._catalog_refs.merge(name)

    def rebase_catalog_branch(self, name: str, drop_conflicting: bool = False) -> dict:
        """Refresh the branch's view of main across every table (the
        recovery flow after a conflicting merge_catalog_branch); see
        catalog_refs.py rebase."""
        return self._catalog_refs.rebase(name, drop_conflicting=drop_conflicting)

    def read(self, identifier: str, catalog_ref: str | None = None):
        """Read a table, optionally as a catalog branch sees it:
        branch-written tables show the branch lineage, untouched tables
        show their fork-point state (main commits after the fork are
        invisible on the branch — Nessie isolation)."""
        if catalog_ref is None:
            return self.table(identifier).read()
        return self._catalog_refs.read(identifier, catalog_ref)

    def append(self, identifier: str, df: DataFrame, catalog_ref: str | None = None):
        """Append to a table, optionally on a catalog branch (the
        per-table branch ref is created lazily at the fork pin)."""
        if catalog_ref is None:
            return self.table(identifier).append(df)
        return self._catalog_refs.append(identifier, df, catalog_ref)

    def overwrite(self, identifier: str, df: DataFrame, catalog_ref: str | None = None):
        if catalog_ref is None:
            return self.table(identifier).overwrite(df)
        return self._catalog_refs.overwrite(identifier, df, catalog_ref)

    def delete_where(self, identifier: str, condition, catalog_ref: str | None = None):
        if catalog_ref is None:
            return self.table(identifier).delete_where(condition)
        return self._catalog_refs.delete_where(identifier, condition, catalog_ref)

    def update_where(
        self,
        identifier: str,
        assignments: dict,
        condition,
        catalog_ref: str | None = None,
    ):
        if catalog_ref is None:
            return self.table(identifier).update_where(assignments, condition)
        return self._catalog_refs.update_where(
            identifier, assignments, condition, catalog_ref
        )

    def create_table_on_branch(
        self,
        identifier: str,
        catalog_ref: str,
        schema: T.StructType | str | None = None,
        properties: dict[str, str] | None = None,
        partition_by: str | None = None,
    ) -> LakehouseTable:
        """CREATE TABLE on a catalog branch: invisible on main until
        merge_catalog_branch publishes it (catalog_refs.create_table)."""
        return self._catalog_refs.create_table(
            identifier,
            catalog_ref,
            schema=schema,
            properties=properties,
            partition_by=partition_by,
        )

    def drop_table_on_branch(self, identifier: str, catalog_ref: str) -> None:
        """DROP TABLE on a catalog branch: a branch-created table
        vanishes now; a fork-pinned main table becomes a tombstone the
        merge publishes (catalog_refs.drop_table)."""
        self._catalog_refs.drop_table(identifier, catalog_ref)

    # ---- namespaces --------------------------------------------------

    def create_namespace(
        self,
        name: str,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = False,
    ) -> None:
        ns_dir = os.path.join(self.warehouse_dir, name)
        marker = os.path.join(ns_dir, _NS_FILE)
        if self.io.exists(marker):
            if if_not_exists:
                return
            raise CatalogError(f"namespace {name} already exists")
        self.io.makedirs(ns_dir)
        self.io.write_text_atomic(
            marker,
            json.dumps({"name": name, "properties": properties or {}, "created_at": time.time()}),
        )

    def namespaces(self) -> list[str]:
        out = []
        for name in self.io.listdir(self.warehouse_dir):
            if self.io.exists(os.path.join(self.warehouse_dir, name, _NS_FILE)):
                out.append(name)
        return out

    def describe_namespace(self, name: str) -> dict:
        marker = os.path.join(self.warehouse_dir, name, _NS_FILE)
        if not self.io.exists(marker):
            raise CatalogError(f"namespace {name} does not exist")
        return json.loads(self.io.read_text(marker))

    # ---- tables ------------------------------------------------------

    _IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

    def _split(self, identifier: str) -> tuple[str, str]:
        if "." not in identifier:
            raise CatalogError(f"expected <namespace>.<table>, got {identifier!r}")
        ns, tbl = identifier.split(".", 1)
        # both parts must be plain identifiers: an empty/path-shaped
        # part would make the table dir escape or BECOME the namespace
        # dir (and drop_table rmtree it wholesale)
        if not self._IDENT_RE.match(ns) or not self._IDENT_RE.match(tbl):
            raise CatalogError(f"invalid identifier {identifier!r}")
        return ns, tbl

    def _table_dir(self, identifier: str) -> str:
        ns, tbl = self._split(identifier)
        return os.path.join(self.warehouse_dir, ns, tbl)

    def create_table(
        self,
        identifier: str,
        schema: T.StructType | str | None = None,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = False,
        partition_by: str | None = None,
    ) -> LakehouseTable:
        """CREATE TABLE ... USING <format> TBLPROPERTIES(...) analog
        (guide :102-110). Commits an empty `create` snapshot carrying
        the table properties. `partition_by` takes an Iceberg-style
        transform list — `"days(ts), bucket(16, id), region"` — stored
        as the `partition.spec` property (see lakehouse/partition.py);
        writers lay data out per transform value and the scan planner
        prunes partitions from metadata."""
        t, make = self._create_plan(identifier, schema, properties, partition_by)
        if t.log.latest_version() is not None:
            if if_not_exists and t.log.latest_main_version() is not None:
                return t
            if t.log.latest_main_version() is None:
                # every commit in this log is branch-tagged: the name is
                # held by a table created ON a catalog branch (DDL on a
                # ref, catalog_refs.create_table). This local layout
                # keys the physical dir by name (no uuid suffix like
                # the reference's object-store layout, module
                # docstring), so a main create of the same name is
                # REFUSED until the branch merges or drops — the
                # conservative end of Nessie's per-branch namespaces,
                # which also prevents the create-on-main-vs-branch
                # rebase conflict by construction.
                raise CatalogError(
                    f"table name {identifier} is held by a catalog-branch "
                    "creation (merge or drop that branch first)"
                )
            raise CatalogError(f"table {identifier} already exists")
        t.log.append(make)
        return t

    def _create_plan(
        self,
        identifier: str,
        schema: T.StructType | str | None = None,
        properties: dict[str, str] | None = None,
        partition_by: str | None = None,
    ):
        """Validate a CREATE TABLE and return (table_handle,
        make_entry) WITHOUT committing — create_table commits to main,
        catalog_refs.create_table commits the same entry onto a
        catalog branch. Existence policy stays with the callers."""
        ns, _ = self._split(identifier)
        if ns not in self.namespaces():
            raise CatalogError(f"namespace {ns} does not exist")
        if self.io.exists(self._view_path(identifier)):
            # one namespace of names: the SQL router expands views
            # BEFORE tables, so a same-named table would be silently
            # shadowed by the view in every statement
            raise CatalogError(f"a view named {identifier} already exists")
        table_dir = self._table_dir(identifier)
        t = LakehouseTable(self.spark, identifier, table_dir, io=self.io)

        props = {str(k): str(v) for k, v in (properties or {}).items()}
        if partition_by:
            from .partition import PROP_PARTITION_SPEC, parse_spec

            parse_spec(partition_by)  # validate transforms up front
            props[PROP_PARTITION_SPEC] = partition_by
        schema_ddl = None
        if schema is not None:
            st = _parse_ddl_cached(schema) if isinstance(schema, str) else schema
            schema_ddl = st.simpleString()
        if props.get("partition.spec"):
            from .partition import parse_spec

            spec = parse_spec(props["partition.spec"])
            if not schema_ddl:
                raise CatalogError(
                    "a partitioned table needs an explicit schema (transform "
                    "source types are validated against it)"
                )
            from .partition import validate_spec_against_schema

            fields = {
                f.name: f.dataType.simpleString()
                for f in _parse_ddl_cached(schema_ddl).fields
            }
            errors = validate_spec_against_schema(spec, fields)
            if errors:
                raise CatalogError("; ".join(errors))

        def make(version: int) -> LogEntry:
            if version != 0:
                # CAS guard: a create entry must be the log's FIRST
                # commit. The caller's existence check runs outside the
                # commit lock, so two creators of the same fresh name
                # (main-vs-main, or main-vs-catalog-branch DDL) can
                # both pass it; whoever allocates v0 wins and the loser
                # fails loudly HERE instead of stacking a second create
                # onto the log — which a later catalog-branch merge
                # would have folded into silent schema/row mixing.
                raise CatalogError(
                    f"table {identifier} was concurrently created "
                    "(a create must be the log's first commit)"
                )
            return LogEntry(
                version=version,
                snapshot_id=version,
                committed_at=time.time(),
                operation="create",
                properties=props,
                extra={"schema": schema_ddl} if schema_ddl else None,
            )

        return t, make

    def table(self, identifier: str, any_lineage: bool = False) -> LakehouseTable:
        table_dir = self._table_dir(identifier)
        # existence check BEFORE constructing LakehouseTable: its
        # TransactionLog __init__ makedirs metadata/, so a failed
        # lookup would leave a phantom table dir behind that tables()
        # then lists as real
        if not self.io.is_dir(os.path.join(table_dir, "metadata")):
            raise CatalogError(f"table {identifier} does not exist")
        t = LakehouseTable(self.spark, identifier, table_dir, io=self.io)
        if t.log.latest_version() is None:
            raise CatalogError(f"table {identifier} does not exist")
        if not any_lineage and t.log.latest_main_version() is None:
            # all commits are branch-tagged: the table was created on a
            # catalog branch and not merged — it does not exist ON MAIN
            # (Nessie per-ref table resolution). Branch-scoped readers
            # (catalog_refs) pass any_lineage=True.
            raise CatalogError(
                f"table {identifier} does not exist on main (created on a "
                "catalog branch; read it through that ref or merge it)"
            )
        return t

    def tables(self, namespace: str, any_lineage: bool = False) -> list[str]:
        ns_dir = os.path.join(self.warehouse_dir, namespace)
        if not self.io.exists(os.path.join(ns_dir, _NS_FILE)):
            raise CatalogError(f"namespace {namespace} does not exist")
        out = []
        for name in self.io.listdir(ns_dir):
            if self.io.is_dir(os.path.join(ns_dir, name)) and self.io.is_dir(
                os.path.join(ns_dir, name, "metadata")
            ):
                if not any_lineage and not self._main_visible(f"{namespace}.{name}"):
                    continue  # branch-created, unmerged: invisible on main
                out.append(name)
        return out

    def _main_visible(self, identifier: str) -> bool:
        """Does the table have at least one main-lineage commit?
        Branch-created (unmerged) tables answer False. O(log entries)
        per table on listing — fine for a local warehouse; a Nessie
        deployment answers this from its commit DAG (catalog_refs.py
        scale note)."""
        from .log import TransactionLog

        md = os.path.join(self._table_dir(identifier), "metadata")
        log = TransactionLog(md, io=self.io)
        return log.latest_version() is not None and log.latest_main_version() is not None

    def drop_table(self, identifier: str, ignore_ref_pins: bool = False) -> None:
        """Physically remove a table. Refused while any catalog ref
        (branch fork pin or tag) still pins it: Nessie keeps a table
        alive on every ref that references it, and this local layout
        keys the physical dir by name, so the rmtree would tear the
        table out from under the ref's time-travel read — drop or
        merge those refs first. `ignore_ref_pins` is for internal
        callers whose drop was already ref-validated (a merge-published
        branch DROP) or whose table no other ref can see (removing a
        branch-created table with its branch).

        The pin check and the rmtree run under the catalog-refs
        REGISTRY lock (r13), mutually atomic with create_tag/
        create_branch's {pin walk + record write} span: a ref created
        concurrently either pins the table before the guard runs (the
        drop refuses) or walks the tables after the rmtree (the
        vanished table simply isn't pinned) — the torn state where a
        fresh ref pins a just-vanished table can no longer form. The
        `ignore_ref_pins` internal path keeps the smaller documented
        bookkeeping-after-flip window (a tag created between a
        catalog merge's marker flip and its published-DROP apply —
        catalog_refs.py module docstring)."""
        table_dir = self._table_dir(identifier)

        def run():
            if not self.io.is_dir(os.path.join(table_dir, "metadata")):
                raise CatalogError(f"table {identifier} does not exist")
            if not ignore_ref_pins:
                holders = self._catalog_refs.pinning_refs(identifier)
                if holders:
                    raise CatalogError(
                        f"table {identifier} is pinned by catalog ref(s) "
                        f"{holders} — drop or merge those refs first"
                    )
            self.io.rmtree(table_dir)

        self._catalog_refs.with_registry_lock(run)

    def describe_table(self, identifier: str) -> dict:
        t = self.table(identifier)
        entries = t.log.entries()
        return {
            "identifier": identifier,
            "location": t.table_dir,
            "properties": t.properties(),
            "current_snapshot_id": entries[-1].snapshot_id if entries else None,
            "snapshots": len(entries),
        }

    # ---- views (Nessie/Iceberg view catalog analog) ------------------
    # The reference stack's catalog (Nessie) versions VIEWS alongside
    # tables; Spark itself only has session-temp views. A catalog view
    # here is a named SQL text stored in the namespace
    # (`<ns>/.views/<name>.json`) that the SQL router expands at
    # reference time — storage-level, so it survives sessions and is
    # visible to every engine reading the warehouse.

    def _committed_table_exists(self, identifier: str) -> bool:
        """True only for a table with at least one committed log entry
        or checkpoint — WITHOUT constructing LakehouseTable (whose log
        __init__ creates metadata/, worsening the phantom problem)."""
        meta = os.path.join(self._table_dir(identifier), "metadata")
        if not self.io.is_dir(meta):
            return False
        import re as _re

        for name in self.io.listdir(meta):
            if _re.match(r"^(\d{10}|checkpoint-\d{10})\.json$", name):
                return True
        return False

    def _view_path(self, identifier: str) -> str:
        ns, name = self._split(identifier)
        return os.path.join(self.warehouse_dir, ns, ".views", f"{name}.json")

    def create_view(
        self, identifier: str, sql_text: str, replace: bool = False
    ) -> None:
        ns, _ = self._split(identifier)
        if ns not in self.namespaces():
            raise CatalogError(f"namespace {ns} does not exist")
        if self._committed_table_exists(identifier):
            # mirror of the create_table guard: tables and views share
            # one identifier namespace (Nessie catalog uniqueness).
            # COMMITTED existence, not a bare is_dir: a failed
            # create_table (invalid partition spec raised after
            # TransactionLog.__init__ made metadata/) leaves a phantom
            # empty dir that must not squat on the name forever —
            # create_table itself tolerates phantoms the same way.
            raise CatalogError(f"a table named {identifier} already exists")
        path = self._view_path(identifier)
        if self.io.exists(path) and not replace:
            raise CatalogError(f"view {identifier} already exists")
        self.io.makedirs(os.path.dirname(path))
        self.io.write_text_atomic(
            path,
            json.dumps(
                {"identifier": identifier, "sql": sql_text, "created_at": time.time()}
            ),
        )

    def view_sql(self, identifier: str) -> str:
        path = self._view_path(identifier)
        if not self.io.exists(path):
            raise CatalogError(f"view {identifier} does not exist")
        return json.loads(self.io.read_text(path))["sql"]

    def views(self, namespace: str) -> list[str]:
        if namespace not in self.namespaces():
            raise CatalogError(f"namespace {namespace} does not exist")
        vdir = os.path.join(self.warehouse_dir, namespace, ".views")
        return sorted(
            n[: -len(".json")]
            for n in self.io.listdir(vdir)
            if n.endswith(".json")
        )

    def drop_view(self, identifier: str) -> None:
        path = self._view_path(identifier)
        if not self.io.exists(path):
            raise CatalogError(f"view {identifier} does not exist")
        self.io.remove(path)
