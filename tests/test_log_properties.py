"""Property-based tests for the transaction log (pure Python, no
Spark): the log is the custom table-format core (SURVEY.md §7 Phase 2),
so its fold semantics get hypothesis coverage beyond the example-based
runbook tests — random operation sequences must satisfy the invariants
every reader depends on.
"""

from __future__ import annotations

import time

from hypothesis import given, settings
from hypothesis import strategies as st

from local_datalakehouse_phase2_spark.lakehouse.log import (
    FileInfo,
    LogEntry,
    TransactionLog,
)

# an operation is (files_to_add, indices_of_live_files_to_remove)
OPS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # n files added
        st.lists(st.integers(min_value=0, max_value=50), max_size=3),  # removal picks
    ),
    min_size=1,
    max_size=12,
)


def _apply_ops(tmp_path, ops):
    """Drive the log through a random add/remove sequence, mirroring it
    in a plain dict; returns (log, expected-state-per-version)."""
    log = TransactionLog(str(tmp_path / "metadata"))
    mirror: dict[str, FileInfo] = {}
    states = {}
    seq = 0
    for n_add, removal_picks in ops:
        added = []
        for _ in range(n_add):
            fi = FileInfo(path=f"data/f{seq}.parquet", size_bytes=10 + seq, row_count=seq)
            seq += 1
            added.append(fi)
        live = sorted(mirror)
        removed = tuple({live[i % len(live)] for i in removal_picks} if live else ())

        def make(version, added=tuple(added), removed=removed):
            return LogEntry(
                version=version,
                snapshot_id=version,
                committed_at=time.time(),
                operation="append" if not removed else "replace",
                added_files=added,
                removed_files=removed,
            )

        e = log.append(make)
        for p in removed:
            del mirror[p]
        for fi in added:
            mirror[fi.path] = fi
        states[e.version] = dict(mirror)
    return log, states


@settings(max_examples=30, deadline=None)
@given(ops=OPS)
def test_state_fold_matches_mirror_at_every_version(tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("log_prop")
    log, states = _apply_ops(tmp, ops)
    for version, expected in states.items():
        assert log.state_at(version) == expected
    # latest == state at latest version
    assert log.state_at() == states[max(states)]


@settings(max_examples=15, deadline=None)
@given(ops=OPS, cp_at=st.integers(min_value=0, max_value=11))
def test_checkpoint_never_changes_any_visible_state(tmp_path_factory, ops, cp_at):
    """A checkpoint is pure compaction: every state_at(v) — before or
    after the checkpoint version — must be identical with and without it."""
    tmp = tmp_path_factory.mktemp("log_cp")
    log, states = _apply_ops(tmp, ops)
    versions = sorted(states)
    target = versions[cp_at % len(versions)]
    log.write_checkpoint(target)
    for version, expected in states.items():
        assert log.state_at(version) == expected
    assert log.state_at() == states[max(states)]


@settings(max_examples=15, deadline=None)
@given(ops=OPS)
def test_versions_are_dense_and_entries_roundtrip(tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("log_rt")
    log, states = _apply_ops(tmp, ops)
    vs = log.versions()
    assert vs == list(range(vs[0], vs[0] + len(vs)))  # dense, ordered
    for e in log.entries():
        again = log.read_entry(e.version)
        assert again == e  # JSON round-trip is lossless


def test_concurrent_writers_never_lose_commits(tmp_path):
    """The O_EXCL commit protocol: N threads racing to append must all
    win distinct, dense versions with every payload present exactly once
    — the optimistic-concurrency guarantee readers rely on (losers
    re-resolve and retry, nobody overwrites)."""
    import threading

    log = TransactionLog(str(tmp_path / "metadata"))
    n_threads, per_thread = 8, 10
    errors = []

    def writer(tid: int):
        try:
            for i in range(per_thread):
                def make(version, tid=tid, i=i):
                    return LogEntry(
                        version=version,
                        snapshot_id=version,
                        committed_at=time.time(),
                        operation="append",
                        added_files=(
                            FileInfo(path=f"data/t{tid}_{i}.parquet", size_bytes=1, row_count=1),
                        ),
                    )
                log.append(make)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    vs = log.versions()
    assert len(vs) == n_threads * per_thread
    assert vs == list(range(len(vs)))  # dense: no gaps, no overwrites
    paths = [fi.path for e in log.entries() for fi in e.added_files]
    assert len(paths) == len(set(paths)) == n_threads * per_thread
    assert len(log.state_at()) == n_threads * per_thread


# ---- stage (write-audit-publish) fold invariants ----------------------

OPS_WITH_STAGE = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # n files added
        st.lists(st.integers(min_value=0, max_value=50), max_size=3),
        st.booleans(),  # staged?
    ),
    min_size=1,
    max_size=12,
)


def _apply_ops_with_stage(tmp_path, ops):
    """Like _apply_ops, but some commits are `stage` entries: the mirror
    (= what main-lineage readers see) must never include their files."""
    log = TransactionLog(str(tmp_path / "metadata"))
    mirror: dict[str, FileInfo] = {}
    states = {}
    staged_paths: set[str] = set()
    seq = 0
    for n_add, removal_picks, is_stage in ops:
        added = []
        for _ in range(n_add):
            fi = FileInfo(path=f"data/f{seq}.parquet", size_bytes=10 + seq, row_count=seq)
            seq += 1
            added.append(fi)
        live = sorted(mirror)
        removed = (
            ()
            if is_stage
            else tuple({live[i % len(live)] for i in removal_picks} if live else ())
        )

        def make(version, added=tuple(added), removed=removed, is_stage=is_stage):
            return LogEntry(
                version=version,
                snapshot_id=version,
                committed_at=time.time(),
                operation="stage" if is_stage else ("append" if not removed else "replace"),
                added_files=added,
                removed_files=removed,
                extra={"wap_id": f"w{version}"} if is_stage else None,
            )

        e = log.append(make)
        if is_stage:
            staged_paths.update(fi.path for fi in added)
        else:
            for p in removed:
                del mirror[p]
            for fi in added:
                mirror[fi.path] = fi
        states[e.version] = dict(mirror)
    return log, states, staged_paths


@settings(max_examples=30, deadline=None)
@given(ops=OPS_WITH_STAGE)
def test_staged_entries_invisible_at_every_version(tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("log_stage")
    log, states, staged = _apply_ops_with_stage(tmp, ops)
    for version, expected in states.items():
        got = log.state_at(version)
        assert got == expected
        assert not (set(got) & staged)  # no staged file ever leaks


@settings(max_examples=15, deadline=None)
@given(ops=OPS_WITH_STAGE, cp_at=st.integers(min_value=0, max_value=11))
def test_checkpoint_with_staged_entries_is_pure_compaction(tmp_path_factory, ops, cp_at):
    tmp = tmp_path_factory.mktemp("log_stage_cp")
    log, states, _ = _apply_ops_with_stage(tmp, ops)
    versions = sorted(states)
    target = versions[cp_at % len(versions)]
    log.write_checkpoint(target)
    for version, expected in states.items():
        assert log.state_at(version) == expected


# ---- file-group planning invariants -----------------------------------


@settings(max_examples=50, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=10_000), min_size=0, max_size=40),
    max_group=st.integers(min_value=1, max_value=20_000),
    min_input=st.integers(min_value=1, max_value=4),
)
def test_plan_file_groups_invariants(sizes, max_group, min_input):
    """Grouping must (a) never split a candidate across groups or drop
    one into two groups, (b) keep every multi-file group within
    max_group bytes (a single file may exceed it — it can't be split),
    (c) only emit groups meeting the eligibility rules."""
    from local_datalakehouse_phase2_spark.lakehouse.maintenance import (
        _plan_file_groups,
    )

    cands = [
        (f"data/f{i:04d}.parquet", FileInfo(path=f"data/f{i:04d}.parquet", size_bytes=s, row_count=1))
        for i, s in enumerate(sizes)
    ]
    max_file_size = 5_000
    groups = _plan_file_groups(cands, max_group, min_input, max_file_size)
    seen = [p for g in groups for p, _ in g]
    assert len(seen) == len(set(seen))  # no file in two groups
    assert set(seen) <= {p for p, _ in cands}
    for g in groups:
        # eligibility: >= min_input files AND more than one file, OR the
        # oversized-file exception (any file above max_file_size must
        # rewrite regardless of the min-input-files gate — the advisor-
        # flagged lone-10GB-file case)
        oversized = any(fi.size_bytes > max_file_size for _, fi in g)
        assert (len(g) >= min_input and len(g) > 1) or oversized
        assert len(g) > 1 or g[0][1].size_bytes > max_file_size
        if len(g) > 1:
            gbytes = sum(fi.size_bytes for _, fi in g)
            # bin-packing may exceed max_group only by the last-added
            # file when a single file alone exceeds the cap
            assert gbytes <= max_group or any(
                fi.size_bytes > max_group for _, fi in g
            )
