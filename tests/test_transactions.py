"""Multi-table atomic transactions (SURVEY.md §2.9).

The capability the reference gets from Nessie's git-like global
commit (/root/reference/docker-compose.yml:6): one commit spanning
tables. Tests cover atomicity of the visibility flip, all-or-nothing
abort on conflict, interleaving with normal writers, checkpoint
safety around pending entries, and GC protection.
"""

from __future__ import annotations

import time

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    CommitConflictError,
    Lakehouse,
    TransactionError,
    expire_snapshots,
    remove_orphan_files,
    rewrite_manifests,
)


@pytest.fixture()
def lake(spark, tmp_path):
    lk = Lakehouse(spark, str(tmp_path / "warehouse"))
    lk.create_namespace("lab")
    return lk


def _df(spark, *rows):
    return spark.createDataFrame(list(rows), "k bigint, v string")


def _rows(t):
    return {tuple(r) for r in t.read().collect()}


def test_two_table_commit_is_atomic(spark, lake):
    a = lake.create_table("lab.orders_t", schema="k bigint, v string")
    b = lake.create_table("lab.agg_t", schema="k bigint, v string")
    a.append(_df(spark, (1, "o")))
    b.append(_df(spark, (1, "s")))

    txn = lake.transaction()
    txn.append("lab.orders_t", _df(spark, (2, "o2")))
    txn.append("lab.agg_t", _df(spark, (2, "s2")))

    # staged but undecided: NEITHER table sees anything
    assert _rows(a) == {(1, "o")}
    assert _rows(b) == {(1, "s")}

    res = txn.commit()
    assert res["status"] == "committed"
    # both visible together, at their original log positions
    assert _rows(a) == {(1, "o"), (2, "o2")}
    assert _rows(b) == {(1, "s"), (2, "s2")}

    # a finished txn refuses further use
    with pytest.raises(TransactionError, match="already committed"):
        txn.append("lab.orders_t", _df(spark, (3, "x")))
    with pytest.raises(TransactionError, match="already committed"):
        txn.commit()


def test_conflict_on_one_table_aborts_all(spark, lake):
    """The brief's core scenario: a conflicting concurrent commit on
    table B aborts the staged commit on A — nothing publishes."""
    a = lake.create_table("lab.ta", schema="k bigint, v string")
    b = lake.create_table("lab.tb", schema="k bigint, v string")
    a.append(_df(spark, (1, "a")))
    b.append(_df(spark, (1, "b")))

    txn = lake.transaction()
    txn.append("lab.ta", _df(spark, (2, "a2")))
    txn.overwrite("lab.tb", _df(spark, (9, "B")))
    # concurrent writer replaces b's files before the txn decides
    b.overwrite(_df(spark, (7, "winner")))

    with pytest.raises(CommitConflictError, match="whole transaction aborts"):
        txn.commit()
    # nothing published anywhere — including table A's clean append
    assert _rows(a) == {(1, "a")}
    assert _rows(b) == {(7, "winner")}
    # the decision is final: the same txn cannot be re-committed
    with pytest.raises(TransactionError, match="already aborted"):
        txn.commit()


def test_concurrent_append_conflicts_with_staged_overwrite(spark, lake):
    """An overwrite claims the whole table; a data file appearing
    between stage and commit is a serialization conflict."""
    b = lake.create_table("lab.ow", schema="k bigint, v string")
    b.append(_df(spark, (1, "b")))
    txn = lake.transaction()
    txn.overwrite("lab.ow", _df(spark, (2, "B")))
    b.append(_df(spark, (3, "sneak")))  # new file under the staged overwrite
    with pytest.raises(CommitConflictError, match="appeared since the overwrite"):
        txn.commit()
    assert _rows(b) == {(1, "b"), (3, "sneak")}


def test_plain_append_interleaves_safely(spark, lake):
    """A non-conflicting normal append between stage and commit lands
    at its own version; the committed txn retro-applies at its
    original position and both survive."""
    a = lake.create_table("lab.inter", schema="k bigint, v string")
    a.append(_df(spark, (1, "a")))
    txn = lake.transaction()
    txn.append("lab.inter", _df(spark, (2, "txn")))
    a.append(_df(spark, (3, "plain")))
    assert _rows(a) == {(1, "a"), (3, "plain")}
    txn.commit()
    assert _rows(a) == {(1, "a"), (2, "txn"), (3, "plain")}


def test_abort_hides_everything_and_gc_reclaims(spark, lake):
    a = lake.create_table(
        "lab.ab", schema="k bigint, v string", properties={"gc.enabled": "true"}
    )
    a.append(_df(spark, (1, "a")))
    txn = lake.transaction()
    txn.append("lab.ab", _df(spark, (2, "dead")))
    staged_version = txn._staged[0][1].version
    txn.abort()
    assert _rows(a) == {(1, "a")}

    # aborted entries are expirable; pending protection does not apply
    # (a later main commit so the aborted entry isn't the raw newest —
    # the newest entry is always kept to prevent version-number reuse)
    a.append(_df(spark, (3, "z")))
    expire_snapshots(a, retain_last=1)
    assert staged_version not in a.log.versions()
    assert _rows(a) == {(1, "a"), (3, "z")}


def test_pending_txn_survives_expiry_and_orphan_sweep(spark, lake, monkeypatch):
    import local_datalakehouse_phase2_spark.lakehouse.maintenance as m

    a = lake.create_table(
        "lab.keep", schema="k bigint, v string", properties={"gc.enabled": "true"}
    )
    a.append(_df(spark, (1, "a")))
    txn = lake.transaction()
    txn.append("lab.keep", _df(spark, (2, "pend")))
    for i in range(3):
        a.append(_df(spark, (10 + i, "m")))

    expire_snapshots(a, retain_last=1)
    monkeypatch.setattr(m, "ORPHAN_SAFETY_SECONDS", -10)
    remove_orphan_files(a, older_than=time.time() + 10)

    # the pending entry and its files survived; committing still works
    txn.commit()
    assert {(2, "pend")} <= _rows(a)


def test_expiry_above_pending_txn_keeps_later_commits(spark, lake):
    """Expiring commits ABOVE a pending txn entry would pair with the
    checkpoint clamp (gap checkpoints land BELOW the pending entry) to
    silently drop the expired commits' effects from every later fold.
    The tail of the log from the earliest pending entry on must be
    kept until the txn decides."""
    a = lake.create_table(
        "lab.gap", schema="k bigint, v string", properties={"gc.enabled": "true"}
    )
    a.append(_df(spark, (1, "a")))
    txn = lake.transaction()
    txn.append("lab.gap", _df(spark, (2, "pend")))
    for i in range(4):
        a.append(_df(spark, (10 + i, "m")))
    before = _rows(a)

    expire_snapshots(a, retain_last=1)
    # every post-pending commit's rows still fold
    assert _rows(a) == before
    txn.commit()
    assert _rows(a) == before | {(2, "pend")}
    # once decided, a later expiry can reclaim normally
    a.append(_df(spark, (99, "z")))
    expire_snapshots(a, retain_last=1)
    assert _rows(a) == before | {(2, "pend"), (99, "z")}


def test_checkpoint_never_freezes_out_pending_txn(spark, lake):
    """rewrite_manifests while a txn is pending must not write a
    checkpoint past the pending entry — the committed txn would
    otherwise vanish from every replay."""
    a = lake.create_table("lab.cp", schema="k bigint, v string")
    a.append(_df(spark, (1, "a")))
    txn = lake.transaction()
    txn.append("lab.cp", _df(spark, (2, "txn")))
    a.append(_df(spark, (3, "later")))

    rewrite_manifests(a)  # would checkpoint at latest without the clamp
    txn.commit()
    assert _rows(a) == {(1, "a"), (2, "txn"), (3, "later")}
    # and after commit, a fresh checkpoint at head folds the txn in
    rewrite_manifests(a)
    assert _rows(a) == {(1, "a"), (2, "txn"), (3, "later")}


def test_txn_schema_evolution_rejected(spark, lake):
    a = lake.create_table("lab.sch", schema="k bigint, v string")
    a.append(_df(spark, (1, "a")))
    txn = lake.transaction()
    with pytest.raises(TransactionError, match="cannot evolve"):
        txn.append(
            "lab.sch",
            spark.createDataFrame([(2, "b", 1.0)], "k bigint, v string, w double"),
        )


def test_one_write_per_table_per_txn(spark, lake):
    a = lake.create_table("lab.one", schema="k bigint, v string")
    a.append(_df(spark, (1, "a")))
    txn = lake.transaction()
    txn.append("lab.one", _df(spark, (2, "b")))
    with pytest.raises(TransactionError, match="one write per table"):
        txn.append("lab.one", _df(spark, (3, "c")))


def test_pending_txn_snapshot_not_addressable(spark, lake):
    a = lake.create_table("lab.addr", schema="k bigint, v string")
    a.append(_df(spark, (1, "a")))
    txn = lake.transaction()
    txn.append("lab.addr", _df(spark, (2, "p")))
    v = txn._staged[0][1].version
    with pytest.raises(ValueError, match="pending"):
        a.read(version=v)
    with pytest.raises(ValueError, match="pending"):
        a.create_tag("bad", at=v)
    txn.commit()
    # once committed it IS a main snapshot: addressable, taggable
    assert a.read(version=v).count() == 2
    a.create_tag("ok", at=v)
