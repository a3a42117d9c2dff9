"""Second-engine oracle resolver (secondengine.py) — non-vacuity audit.

The converted lakehouse oracles recompute expected quantities by
independently resolving the committed table state in DuckDB. These
tests prove the resolution is LOAD-BEARING: tampering with the
committed state (flipping an aborted transaction marker, deleting a
position-delete file from the log) changes what the second engine
reads, so a wrong engine commit cannot hash-match. Pattern follows
tests/test_oracle_mutations.py: assert the untampered pair green
FIRST, then assert the mutation flips the verdict.
"""

from __future__ import annotations

import glob
import json
import os

import duckdb
import pytest

from local_datalakehouse_phase2_spark.registry import all_specs
from local_datalakehouse_phase2_spark.secondengine import wh_dir


def _oracle_df(sql):
    return duckdb.connect().execute(sql).df()


def _vhash(df):
    import hashlib

    df = df[sorted(df.columns)]
    return hashlib.md5(
        str(sorted(tuple(map(str, r)) for r in df.itertuples(index=False))).encode()
    ).hexdigest()


def _run(spark, name):
    spec = all_specs()[name]
    spd = spec.fn(spark, "/root/testdata/sf0.001").toPandas()
    return spd, spec.oracle


def test_txn_marker_is_load_bearing(spark):
    """Flipping an aborted txn marker to committed must change the
    second engine's fold — the aborted transaction's staged entries
    become visible and every dependent count moves."""
    spd, sql = _run(spark, "lakehouse_multi_table_txn")
    assert _vhash(spd) == _vhash(_oracle_df(sql))  # green first

    wh = wh_dir("lakehouse_multi_table_txn")
    markers = [
        p
        for p in glob.glob(os.path.join(wh, ".txns", "*.json"))
        if "_sentinel" not in p
    ]
    flipped = None
    for p in markers:
        raw = json.loads(open(p).read())
        if raw.get("status") == "aborted":
            raw["status"] = "committed"
            open(p, "w").write(json.dumps(raw))
            flipped = p
            break
    assert flipped, "scenario should have an aborted transaction"
    assert _vhash(spd) != _vhash(_oracle_df(sql)), (
        "oracle did not notice an aborted txn flipping to committed — "
        "the marker rule is not load-bearing"
    )


def test_pos_delete_file_is_load_bearing(spark):
    """Dropping the position-delete file from the delete commit's
    added_files must resurrect the deleted rows in the second engine's
    read."""
    spd, sql = _run(spark, "lakehouse_mor_delete")
    assert _vhash(spd) == _vhash(_oracle_df(sql))  # green first

    wh = wh_dir("lakehouse_mor_delete")
    md = os.path.join(wh, "lab", "nation_mor", "metadata")
    tampered = False
    for p in sorted(glob.glob(os.path.join(md, "0*.json"))):
        raw = json.loads(open(p).read())
        if raw.get("operation") == "delete":
            raw["added_files"] = [
                f for f in raw["added_files"] if f.get("content") != 1
            ]
            open(p, "w").write(json.dumps(raw))
            tampered = True
            break
    assert tampered
    assert _vhash(spd) != _vhash(_oracle_df(sql)), (
        "oracle did not notice the position-delete file vanishing from "
        "the log — delete application is not load-bearing"
    )


def test_data_value_is_load_bearing(spark):
    """The oracle reads actual parquet VALUES, not just file counts:
    swapping a live data file's path for another live file's must
    change a value-dependent quantity (upd_rows counts UPD_ names)."""
    spd, sql = _run(spark, "lakehouse_delete_merge")
    assert _vhash(spd) == _vhash(_oracle_df(sql))  # green first

    wh = wh_dir("lakehouse_delete_merge")
    md = os.path.join(wh, "lab", "nation_dm", "metadata")
    # remove the MERGE commit's file replacements: its adds carry the
    # UPD_ rows, so the second engine must see fewer/no UPD_ names
    for p in sorted(glob.glob(os.path.join(md, "0*.json"))):
        raw = json.loads(open(p).read())
        if raw.get("operation") == "merge":
            raw["added_files"] = []
            raw["removed_files"] = []
            open(p, "w").write(json.dumps(raw))
            break
    assert _vhash(spd) != _vhash(_oracle_df(sql))


def test_delete_flags_cover_live_content_classes(spark):
    """Every second-engine-checked scenario whose FINAL live state
    carries delete files must have the matching clause in its oracle
    SQL — a scenario that grows delete files cannot silently skip
    applying them (secondengine.TableResolver.rows contract)."""
    names = [
        n
        for n, s in all_specs().items()
        if s.oracle and "_secondengine/" in s.oracle
    ]
    assert len(names) >= 10  # the r12 conversion bar
    for name in names:
        spec = all_specs()[name]
        spec.fn(spark, "/root/testdata/sf0.001").count()
        wh = wh_dir(name)
        for meta in glob.glob(os.path.join(wh, "*", "*", "metadata")):
            live: dict[str, int] = {}  # path -> content, add/remove folded
            for p in sorted(glob.glob(os.path.join(meta, "0*.json"))):
                raw = json.loads(open(p).read())
                for path in raw.get("removed_files") or []:
                    live.pop(path, None)
                for f in raw.get("added_files") or []:
                    live[f["path"]] = f.get("content") or 0
            classes = set(live.values())
            if 1 in classes and name != "lakehouse_changelog":
                # changelog's oracle never reads resolved table rows —
                # its delete files are the SUBJECT (counted per commit
                # as delete/update_before rows), not a filter to apply,
                # so the apply-clause requirement doesn't arise there
                assert "pd.pos = d.file_row_number" in spec.oracle, (
                    f"{name}: scenario writes position deletes but its "
                    "oracle never applies them"
                )
            if 2 in classes:
                assert "el.content = 2" in spec.oracle, (
                    f"{name}: scenario writes equality deletes but its "
                    "oracle never applies them"
                )


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
