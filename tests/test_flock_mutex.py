"""Cross-PROCESS CAS arbitration via FlockMutex (VERDICT r9 task #4).

tests/test_cas_seam.py proves the ArbitratedFileIO contract between
THREADS, where the default process-local mutex suffices. This file
re-proves all three consumers of `create_exclusive` between real OS
processes — where threading.Lock is a documented non-solution — using
the flock(2) backend:

- log-entry commits: the naive racy store loses one of two concurrent
  appends; under FlockMutex the loser retries at the next version and
  all three commits survive.
- per-ref advisory locks: two processes' critical sections overlap on
  the naive store; never under flock.
- transaction markers: both naive racers believe they decided; under
  flock exactly one create_exclusive wins.

The processes synchronize check-to-put overlap with a fork-inherited
multiprocessing.Barrier — the same deterministic-race technique as the
thread tests (and with the same rule: seed fixtures UN-armed, because
a timed-out barrier is broken forever).
"""

from __future__ import annotations

import json
import multiprocessing
import os
import time

from local_datalakehouse_phase2_spark.lakehouse.fs import (
    ArbitratedFileIO,
    FlockMutex,
)
from local_datalakehouse_phase2_spark.lakehouse.log import TransactionLog

from .test_cas_seam import RacyFileIO, _entry_maker

_MP = multiprocessing.get_context("fork")


def _mk_io(barrier, lock_dir):
    io = RacyFileIO(barrier)
    return ArbitratedFileIO(io, mutex=FlockMutex(lock_dir)) if lock_dir else io


def _append_worker(meta_dir, barrier, tag, lock_dir):
    log = TransactionLog(meta_dir, io=_mk_io(barrier, lock_dir))
    log.append(_entry_maker(tag))


def _reflock_worker(meta_dir, barrier, tag, lock_dir, out_dir):
    log = TransactionLog(meta_dir, io=_mk_io(barrier, lock_dir))

    def critical():
        start = time.monotonic()
        time.sleep(0.2)
        return start, time.monotonic()

    start, end = log._with_ref_lock("dev", critical)
    with open(os.path.join(out_dir, f"{tag}.json"), "w") as f:
        json.dump({"start": start, "end": end}, f)


def _marker_worker(marker_path, barrier, tag, lock_dir, out_dir):
    io = _mk_io(barrier, lock_dir)
    won = io.create_exclusive(marker_path, json.dumps({"decider": tag}))
    with open(os.path.join(out_dir, f"{tag}.json"), "w") as f:
        json.dump({"won": won}, f)


def _race_procs(target, args_a, args_b):
    pa = _MP.Process(target=target, args=args_a)
    pb = _MP.Process(target=target, args=args_b)
    pa.start(), pb.start()
    pa.join(20), pb.join(20)
    assert pa.exitcode == 0 and pb.exitcode == 0


def _seeded_log(tmp_path, name):
    meta = str(tmp_path / name / "metadata")
    log = TransactionLog(meta, io=RacyFileIO())  # seed un-armed
    log.append(_entry_maker("seed"))
    return meta, log


def test_commit_race_two_processes(tmp_path):
    # NAIVE: both processes pass the version-1 existence check together
    # (barrier), both PUT, one commit vanishes.
    meta, log = _seeded_log(tmp_path, "naive")
    barrier = _MP.Barrier(2)
    _race_procs(_append_worker, (meta, barrier, "a", None), (meta, barrier, "b", None))
    assert len(TransactionLog(meta, io=RacyFileIO()).versions()) == 2  # LOST

    # FLOCK: same racy store, kernel-mediated mutex — loser retries,
    # nothing lost, every writer's entry present.
    meta2, _ = _seeded_log(tmp_path, "locked")
    lock_dir = str(tmp_path / "locks")
    barrier2 = _MP.Barrier(2)
    _race_procs(
        _append_worker,
        (meta2, barrier2, "a", lock_dir),
        (meta2, barrier2, "b", lock_dir),
    )
    log2 = TransactionLog(meta2, io=RacyFileIO())
    assert len(log2.versions()) == 3
    writers = {(log2.read_entry(v).extra or {}).get("writer") for v in log2.versions()}
    assert writers == {"seed", "a", "b"}


def test_ref_lock_race_two_processes(tmp_path):
    def run_pair(name, lock_dir):
        meta, log = _seeded_log(tmp_path, name)
        log.create_ref("dev", 0, kind="branch")
        out = str(tmp_path / f"{name}_out")
        os.makedirs(out)
        barrier = _MP.Barrier(2)
        _race_procs(
            _reflock_worker,
            (meta, barrier, "a", lock_dir, out),
            (meta, barrier, "b", lock_dir, out),
        )
        spans = [
            json.load(open(os.path.join(out, f"{t}.json"))) for t in ("a", "b")
        ]
        a, b = sorted(spans, key=lambda s: s["start"])
        return a["end"] > b["start"]  # critical sections overlapped?

    assert run_pair("reflock_naive", None)
    assert not run_pair("reflock_locked", str(tmp_path / "locks2"))


def test_marker_race_two_processes(tmp_path):
    def run_pair(name, lock_dir):
        d = tmp_path / name
        os.makedirs(d)
        out = str(tmp_path / f"{name}_out")
        os.makedirs(out)
        barrier = _MP.Barrier(2)
        _race_procs(
            _marker_worker,
            (str(d / "txn.json"), barrier, "commit", lock_dir, out),
            (str(d / "txn.json"), barrier, "abort", lock_dir, out),
        )
        return sum(
            json.load(open(os.path.join(out, f"{t}.json")))["won"]
            for t in ("commit", "abort")
        )

    assert run_pair("marker_naive", None) == 2  # both believe they decided
    assert run_pair("marker_locked", str(tmp_path / "locks3")) == 1  # one winner
