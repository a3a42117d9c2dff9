"""Oracle mutation audit: prove the DuckDB differential check is
NON-VACUOUS for the most complex oracles (VERDICT r9 task #3).

The r7 funnel episode showed a green oracle can be vacuous — on the
synthetic events table every user reaches every funnel stage, so the
stage COUNTS match under any ordering semantics. Each case here seeds
one deliberate semantic mutation and asserts the comparison goes RED:

- SQL-side cases mutate the registered oracle (drop a gate, change a
  frame kind, widen a session gap...) and run the REAL Spark query
  against it. A failure proves the sf0.01 data actually exercises that
  semantic dimension and the compare discriminates it.
- Spark-side cases monkeypatch one product seam (sequence-number
  gating, position-delete pruning, changelog update pairing) and run
  the MUTATED product against the real oracle — the direction that
  matters for literal-VALUES lifecycle oracles, where the oracle IS
  the pinned expected output and only the engine can drift.

Each case first asserts the unmutated pair still matches, so a red
result is attributable to the mutation and not to environment drift.

Known, deliberate blind spot: strict-vs-inclusive gate boundaries
(`>` vs `>=`) are invisible at sf0.01 because no two stage events
share a timestamp; tests/test_funnel_ordering.py discriminates those
on a crafted fixture.
"""

from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.lakehouse import table as table_mod
from local_datalakehouse_phase2_spark.registry import all_specs

from .conftest import SF_ORACLE
from .oracle import compare, duckdb_connection

SPECS = all_specs()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_ORACLE)
    yield c
    c.close()


# (query, substring to replace in the oracle SQL, replacement, what the
#  mutation breaks). Every `old` must appear in the oracle verbatim.
SQL_MUTATIONS = [
    (
        "funnel_conversion",
        "AND e.ts > s1.t1",
        "",
        "view->click ordering gate dropped (clicks before first view count)",
    ),
    (
        "funnel_conversion",
        "AND e.ts > s2.t2",
        "",
        "click->purchase ordering gate dropped",
    ),
    (
        "sequence_packing",
        "ORDER BY doc_id ROWS",
        "ORDER BY doc_id DESC ROWS",
        "prefix-sum pack order reversed (greedy packing is order-defined)",
    ),
    (
        "asof_click_attribution",
        "ORDER BY c.ts DESC, c.event_id DESC",
        "ORDER BY c.ts ASC, c.event_id ASC",
        "as-of picks EARLIEST prior click instead of latest",
    ),
    (
        "session_window_activity",
        "INTERVAL 30 MINUTE",
        "INTERVAL 60 MINUTE",
        "session gap doubled (fewer session splits)",
    ),
    (
        "window_trailing_range",
        "RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 30 PRECEDING AND CURRENT ROW",
        "time-RANGE frame degraded to a row-count frame",
    ),
    (
        "retention_cohorts",
        "day_offset <= 3",
        "day_offset <= 2",
        "retention horizon off by one day",
    ),
    (
        "streaming_dedup_events",
        "SELECT DISTINCT event_id, event_type",
        "SELECT event_id, event_type",
        "exactly-once dedup dropped (duplicates double the counts)",
    ),
]


@pytest.mark.parametrize(
    "name,old,new,why",
    SQL_MUTATIONS,
    ids=[f"{n}:{why[:35]}" for n, _, _, why in SQL_MUTATIONS],
)
def test_oracle_catches_sql_mutation(name, old, new, why, spark, con):
    spec = SPECS[name]
    assert old in spec.oracle, f"mutation anchor drifted out of {name}'s oracle"
    df = spec.fn(spark, SF_ORACLE)
    compare(df, con, spec.oracle)  # baseline: unmutated pair is green
    with pytest.raises(AssertionError):
        compare(df, con, spec.oracle.replace(old, new))


def _run_vs_oracle(spark, con, name):
    spec = SPECS[name]
    compare(spec.fn(spark, SF_ORACLE), con, spec.oracle)


def test_oracle_catches_broken_seq_gating(spark, con, monkeypatch):
    """Destroy the sequence-number rule: every file reports seq 0, so
    no equality delete ever applies (delete seq > data seq is never
    true). The pinned lifecycle counts must go red."""
    _run_vs_oracle(spark, con, "lakehouse_equality_delete")  # baseline green
    monkeypatch.setattr(
        table_mod.LakehouseTable, "_seq_of", staticmethod(lambda fi: 0)
    )
    with pytest.raises(AssertionError):
        _run_vs_oracle(spark, con, "lakehouse_equality_delete")


def test_oracle_catches_dropped_pos_deletes(spark, con, monkeypatch):
    """Break the read-side content classification: position-delete
    files (content=1) vanish from the snapshot state, so MOR-deleted
    rows resurface and the pinned lifecycle counts go red. (The first
    draft of this test patched `_pos_delete_may_reference` — and was
    NOT caught, because `_assemble_read` scopes position deletes by
    its own file_path-bounds bisection; that helper only scopes the
    changelog/compaction paths. The audit's job is exactly to find
    such non-load-bearing patch points.)"""
    _run_vs_oracle(spark, con, "lakehouse_mor_delete")  # baseline green
    orig = table_mod.LakehouseTable._split_state

    def drop_pos(state):
        data, _pos, eq = orig(state)
        return data, [], eq

    monkeypatch.setattr(
        table_mod.LakehouseTable, "_split_state", staticmethod(drop_pos)
    )
    with pytest.raises(AssertionError):
        _run_vs_oracle(spark, con, "lakehouse_mor_delete")


def test_oracle_catches_unpaired_changelog_updates(spark, con, monkeypatch):
    """Disable identifier-based update pairing: the UPDATE surfaces as
    delete+insert instead of update_before/update_after, changing the
    per-change-type counts the oracle pins."""
    _run_vs_oracle(spark, con, "lakehouse_changelog")  # baseline green
    orig = table_mod.LakehouseTable.read_changelog
    monkeypatch.setattr(
        table_mod.LakehouseTable,
        "read_changelog",
        lambda self, from_version, to_version=None, identifier_columns=None: orig(
            self, from_version, to_version, None
        ),
    )
    with pytest.raises(AssertionError):
        _run_vs_oracle(spark, con, "lakehouse_changelog")


def test_oracle_catches_broken_fork_pin(spark, con, monkeypatch):
    """Destroy catalog-branch fork isolation: reads of a branch-written
    table resolve against CURRENT main instead of the per-table branch
    lineage (pin + chain), so the post-fork main move leaks into the
    branch counts and the pinned lifecycle rows go red."""
    from local_datalakehouse_phase2_spark.lakehouse import catalog_refs as cr

    _run_vs_oracle(spark, con, "lakehouse_catalog_branch")  # baseline green

    def read_main(self, identifier, name):
        self._read_record(name)  # keep existence/refusal semantics
        return self.lake.table(identifier).read()

    monkeypatch.setattr(cr.CatalogRefs, "read", read_main)
    # detection is either a red row comparison (pre-r12 steps) or the
    # r12 ddl_create_on_branch step dying outright: a main read of a
    # branch-created table raises CatalogError (no main lineage) before
    # any rows come back — louder than a mismatch, still a catch
    from local_datalakehouse_phase2_spark.lakehouse import CatalogError

    with pytest.raises((AssertionError, CatalogError)):
        _run_vs_oracle(spark, con, "lakehouse_catalog_branch")


def test_oracle_catches_non_atomic_catalog_merge(spark, con, monkeypatch):
    """Destroy all-or-nothing: skip the per-table conflict validation
    inside merge staging AND the marker-time re-check, so the
    conflicting merge publishes instead of rejecting — the
    conflict_rejected row's counts (and detail string) go red."""
    from local_datalakehouse_phase2_spark.lakehouse import catalog_refs as cr

    _run_vs_oracle(spark, con, "lakehouse_catalog_branch")  # baseline green

    orig_stage = cr.CatalogRefs._stage_merge_entry

    def stage_unvalidated(self, t, name, txn_id, chain):
        added, removed = self._net_effect(t, chain)
        import time as _t

        from local_datalakehouse_phase2_spark.lakehouse.log import (
            LogEntry,
            _dc_replace,
        )

        def make(version):
            return LogEntry(
                version=version,
                snapshot_id=version,
                committed_at=_t.time(),
                operation="merge",
                added_files=tuple(
                    _dc_replace(fi, seq=version) for fi in added.values()
                ),
                removed_files=tuple(sorted(p for p in removed)),
                extra={"txn": txn_id, "catalog_ref": name},
            )

        return t.log.append(make)

    monkeypatch.setattr(cr.CatalogRefs, "_stage_merge_entry", stage_unvalidated)
    monkeypatch.setattr(cr.CatalogRefs, "_revalidate", lambda self, t, e: None)
    with pytest.raises(AssertionError):
        _run_vs_oracle(spark, con, "lakehouse_catalog_branch")


def test_oracle_catches_drifting_tag_pin(spark, con, monkeypatch):
    """Break tag immutability: a tag read resolves the table at CURRENT
    main head instead of the record's pinned version, so the post-tag
    main append leaks into the tag_pinned row. The r13 recomputing
    oracle resolves the pin from the .catalog_refs record JSON itself
    (secondengine.TableResolver.tag_pin), so this mutation is exactly
    the drift it must discriminate."""
    from local_datalakehouse_phase2_spark.lakehouse import catalog_refs as cr

    _run_vs_oracle(spark, con, "lakehouse_catalog_branch")  # baseline green

    orig = cr.CatalogRefs._pin_of

    def head_pin(self, record, identifier):
        pin = orig(self, record, identifier)
        if self._kind(record) == "tag":
            head = self.lake.table(identifier, any_lineage=True).log.latest_main_version()
            return head if head is not None else pin
        return pin

    monkeypatch.setattr(cr.CatalogRefs, "_pin_of", head_pin)
    with pytest.raises(AssertionError):
        _run_vs_oracle(spark, con, "lakehouse_catalog_branch")


# ---- r14: catalog-ref RESOLVER mutations (VERDICT r13 item 8) -------
# The r13 conversion made the second engine DERIVE catalog-branch
# history structurally (secondengine.py cat_fork_base / cat_chain /
# branch-evidence tagging) instead of pinning literals. These cases
# mutate each derivation in the GENERATED oracle SQL and run the real
# engine against it — red proves the derivation is load-bearing, i.e.
# the forty recomputed quantities actually depend on it.
RESOLVER_MUTATIONS = [
    # NOTE a bare off-by-one (min(version) - 1 -> min(version)) is
    # structurally INVISIBLE, and the audit proved it: version slots
    # are globally unique, so no MAIN entry can sit at the branch
    # commit's own version and the fold upto v equals the fold upto
    # v-1. The load-bearing property is that the fork base stays
    # BEFORE the post-fork main commits — so the seeded mutation
    # resolves the fork past them.
    (
        "lakehouse_catalog_branch",
        "min(version) - 1",
        "min(version) + 100",
        "wrong fork base: the branch resolves against post-fork main"
        " state, breaking fork isolation in every branch-scoped count",
    ),
    (
        "lakehouse_catalog_branch",
        "CAST(json_extract(extra, '$.merged_commits') AS BIGINT[])",
        "(CAST(json_extract(extra, '$.merged_commits') AS BIGINT[]))[1:-2]",
        "merged_commits census off by one: the chain's last published"
        " commit drops from every merge fold and census count",
    ),
    (
        "lakehouse_catalog_branch",
        "catalog.etl",
        "catalog.wrong",
        "chain commits mis-tagged: branch evidence resolves empty, so"
        " fork bases and branch reads derive from nothing",
    ),
]


@pytest.mark.parametrize(
    "name,old,new,why",
    RESOLVER_MUTATIONS,
    ids=[f"resolver:{why[:40]}" for _, _, _, why in RESOLVER_MUTATIONS],
)
def test_oracle_catches_resolver_mutation(name, old, new, why, spark, con):
    spec = SPECS[name]
    assert old in spec.oracle, f"mutation anchor drifted out of {name}'s oracle"
    df = spec.fn(spark, SF_ORACLE)
    compare(df, con, spec.oracle)  # baseline: unmutated resolver is green
    with pytest.raises(AssertionError):
        compare(df, con, spec.oracle.replace(old, new))
