"""Round-12 race self-review (VERDICT r11 item 7): the seams added
this round and last — direct per-table merge vs the catalog-branch
protocol, and EndpointMutex stealing from a live (stalled) holder."""

from __future__ import annotations

import threading
import time

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    Lakehouse,
    MaintenanceError,
    merge_branch,
    rebase_branch,
)
from local_datalakehouse_phase2_spark.lakehouse.fs import EndpointMutex


def _df(spark, *rows):
    return spark.createDataFrame(list(rows), "k bigint, v string")


def test_direct_merge_of_managed_catalog_ref_refused(spark, tmp_path):
    """merge_branch / rebase_branch on a reserved `catalog.` per-table
    ref must refuse: publishing a member chain outside the catalog
    record's pins/marker protocol would make the later catalog merge
    double-apply or spuriously conflict. The catalog layer's own
    rebase (managed=True) still works."""
    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    t = lake.create_table("lab.t", schema="k bigint, v string")
    t.append(_df(spark, (1, "m1")).coalesce(1))
    lake.create_branch("etl")
    lake.append("lab.t", _df(spark, (2, "e2")), catalog_ref="etl")

    with pytest.raises(MaintenanceError, match="managed by a catalog-wide"):
        merge_branch(t, "catalog.etl")
    with pytest.raises(MaintenanceError, match="managed by a catalog-wide"):
        rebase_branch(t, "catalog.etl")

    # the protocol paths still function
    t.append(_df(spark, (9, "m9")))  # main moves so rebase has work
    lake.rebase_catalog_branch("etl")
    res = lake.merge_catalog_branch("etl")
    assert res["merged_tables"] == 1
    assert {tuple(r) for r in lake.read("lab.t").collect()} == {
        (1, "m1"),
        (2, "e2"),
        (9, "m9"),
    }


def test_endpoint_mutex_steal_from_live_holder(tmp_path, monkeypatch):
    """A thief stealing a stalled-but-alive holder's row must (a) win
    exactly once, (b) survive the stalled holder's eventual release
    (conditional delete on owner is a no-op), and (c) keep excluding
    third parties until the THIEF releases."""
    from local_datalakehouse_phase2_spark.lakehouse import log as _log

    monkeypatch.setattr(_log, "LOCK_STEAL_SECONDS", 0.2)
    mx = EndpointMutex(str(tmp_path / "locks.db"), timeout_s=5.0)
    path = str(tmp_path / "res")

    events: list[str] = []
    holder_entered = threading.Event()
    thief_done = threading.Event()

    def holder():
        with mx(path):
            events.append("holder-in")
            holder_entered.set()
            # stall past the steal threshold while STILL alive
            thief_done.wait(10)
        events.append("holder-released")

    def thief():
        holder_entered.wait(5)
        time.sleep(0.3)  # age the row past LOCK_STEAL_SECONDS
        with mx(path):
            events.append("thief-in")
            thief_done.set()
            # hold long enough for the stalled holder to release first
            time.sleep(0.3)
        events.append("thief-released")

    th, tt = threading.Thread(target=holder), threading.Thread(target=thief)
    th.start(), tt.start()
    th.join(15), tt.join(15)
    assert not th.is_alive() and not tt.is_alive()
    # holder released while the thief held: the conditional delete must
    # not have freed the thief's row — assert by ordering: the thief's
    # release comes after the holder's, and a fresh acquire works now
    assert events.index("holder-released") < events.index("thief-released")
    with mx(path):
        events.append("third-in")
    assert events[-1] == "third-in"


def test_endpoint_mutex_concurrent_thieves_exclude(tmp_path, monkeypatch):
    """Eight thieves racing to steal ONE stale row: the BEGIN IMMEDIATE
    read-check-update must serialize them — at most one inside the
    critical section at any instant, every thread eventually through."""
    import sqlite3

    from local_datalakehouse_phase2_spark.lakehouse import log as _log

    monkeypatch.setattr(_log, "LOCK_STEAL_SECONDS", 0.05)
    db = str(tmp_path / "locks.db")
    mx = EndpointMutex(db, timeout_s=20.0)
    path = str(tmp_path / "res")
    # plant a stale row from a "crashed" holder
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE IF NOT EXISTS locks ("
        " path TEXT PRIMARY KEY, owner TEXT, acquired_at REAL)"
    )
    canon_probe = []
    with mx(str(tmp_path / "probe")):
        canon_probe.append(True)  # ensures table exists via the mutex itself
    import os

    canon = os.path.realpath(path)
    con.execute(
        "INSERT OR REPLACE INTO locks VALUES (?, ?, ?)",
        (canon, "dead-holder", time.time() - 60),
    )
    con.commit()
    con.close()

    inside = [0]
    max_inside = [0]
    errors: list[BaseException] = []
    guard = threading.Lock()

    def worker():
        try:
            with mx(path):
                with guard:
                    inside[0] += 1
                    max_inside[0] = max(max_inside[0], inside[0])
                time.sleep(0.01)
                with guard:
                    inside[0] -= 1
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(30)
    assert not errors, errors
    assert max_inside[0] == 1, f"mutual exclusion violated: {max_inside[0]} inside"
