"""Maintenance scoped to a ref (round 12; VERDICT r11 item 3):
rewrite_data_files(ref=...) compacts a BRANCH lineage — candidates and
reads come from the branch state, the replace commits onto the branch,
main stays byte-identical, and the merge's net-effect fold treats the
rewrite as branch-internal churn."""

from __future__ import annotations

import time

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    Lakehouse,
    merge_branch,
    remove_orphan_files,
    rewrite_data_files,
)


def _mk(spark, tmp_path, name):
    lake = Lakehouse(spark, str(tmp_path / name))
    lake.create_namespace("lab")
    t = lake.create_table(
        "lab.t",
        schema="k bigint, v string",
        properties={"write.target-file-size-bytes": "65536", "gc.enabled": "true"},
    )
    t.append(
        spark.createDataFrame([(i, f"m{i}") for i in range(10)], "k bigint, v string")
        .coalesce(1)
    )
    return lake, t


def _branch_small_files(spark, t):
    t.create_branch("dev")
    for lo in (100, 200, 300):
        t.append(
            spark.createDataFrame(
                [(lo + i, f"b{lo + i}") for i in range(8)], "k bigint, v string"
            ).repartition(4, "k"),
            ref="dev",
        )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_compact_on_branch_commits_to_branch(spark, tmp_path):
    lake, t = _mk(spark, tmp_path, "w1")
    _branch_small_files(spark, t)
    main_state_before = dict(t.log.state_at())
    branch_rows_before = _rows(t.read(ref="dev"))
    files_before = len(t.log.state_at_branch("dev"))

    res = rewrite_data_files(t, target_file_size_bytes=134217728, ref="dev")
    assert res["rewritten_files"] > 0

    # branch: same rows, fewer files; the replace is a branch commit
    assert _rows(t.read(ref="dev")) == branch_rows_before
    assert len(t.log.state_at_branch("dev")) < files_before
    head = t.log.read_entry(t.log.latest_version())
    assert head.operation == "replace" and (head.extra or {}).get("branch") == "dev"
    # main: byte-identical state
    assert dict(t.log.state_at()) == main_state_before
    assert _rows(t.read()) == {(i, f"m{i}") for i in range(10)}


def test_compact_then_merge_equals_merge_then_compact(spark, tmp_path):
    lake_a, ta = _mk(spark, tmp_path, "wa")
    lake_b, tb = _mk(spark, tmp_path, "wb")
    _branch_small_files(spark, ta)
    _branch_small_files(spark, tb)

    # A: compact ON the branch, then merge
    rewrite_data_files(ta, target_file_size_bytes=134217728, ref="dev")
    merge_branch(ta, "dev")
    # B: merge, then compact on main
    merge_branch(tb, "dev")
    rewrite_data_files(tb, target_file_size_bytes=134217728)

    assert _rows(ta.read()) == _rows(tb.read())
    # A's merge published the COMPACTED files, not the small originals:
    # net-effect fold cancelled the replaced chain files
    merge_entry = next(
        e for e in reversed(ta.log.entries()) if e.operation == "merge"
    )
    assert len(merge_entry.added_files) < 12  # 3 appends x 4 buckets pre-compaction


def test_orphan_sweep_spares_branch_rewrite_outputs(spark, tmp_path):
    lake, t = _mk(spark, tmp_path, "w2")
    _branch_small_files(spark, t)
    rewrite_data_files(t, target_file_size_bytes=134217728, ref="dev")
    before = _rows(t.read(ref="dev"))
    swept = remove_orphan_files(t, older_than=time.time() - 24 * 3600 - 1)
    assert swept["deleted_files"] == 0
    assert _rows(t.read(ref="dev")) == before
    assert _rows(t.read()) == {(i, f"m{i}") for i in range(10)}


def test_compact_on_missing_ref_raises(spark, tmp_path):
    lake, t = _mk(spark, tmp_path, "w3")
    with pytest.raises(ValueError, match="does not exist"):
        rewrite_data_files(t, ref="nope")


def test_compact_on_ref_crash_sweep(spark, tmp_path):
    """Crash injection over rewrite_data_files(ref=...): at every
    successive metadata-write point, a fresh Lakehouse must read BOTH
    lineages cleanly, the branch rows must be exactly the pre-state
    (compaction is row-preserving, so pre == post), and main must stay
    byte-identical — the same all-or-nothing claim the main compaction
    sweep makes, now for the branch-scoped path."""
    from tests.test_crash_atomicity import CrashingFileIO

    points = 0
    for budget in range(40):
        lake, t = _mk(spark, tmp_path, f"crash_{budget}")
        _branch_small_files(spark, t)
        main_rows = _rows(t.read())
        branch_rows = _rows(t.read(ref="dev"))

        io = CrashingFileIO(budget)
        crash_lake = Lakehouse(spark, lake.warehouse_dir, io=io)
        ct = crash_lake.table("lab.t")
        try:
            rewrite_data_files(ct, min_input_files=2, ref="dev")
            crashed = io.crashed
        except Exception:
            crashed = True
        if not crashed:
            break
        points += 1

        check = Lakehouse(spark, lake.warehouse_dir)  # clean IO
        vt = check.table("lab.t")
        assert _rows(vt.read()) == main_rows, f"crash@{budget}: main moved"
        assert _rows(vt.read(ref="dev")) == branch_rows, (
            f"crash@{budget}: branch rows torn"
        )
    else:
        pytest.fail("compact-on-ref still crashing after 40 write points")
    assert points >= 1  # the op does write metadata pre-completion
    # and the surviving (uncrashed) run actually compacted the branch
    final = Lakehouse(spark, lake.warehouse_dir).table("lab.t")
    assert _rows(final.read(ref="dev")) == branch_rows
    assert _rows(final.read()) == main_rows


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
