"""Differential property test for the table-format core.

Random operation sequences (append / overwrite / delete / rename /
drop / re-add / compact / checkpoint / expire / rollback) run against
BOTH the lakehouse table and a small pure-Python reference model;
after every operation the table's visible rows and schema must equal
the model's. This is the same differential idea as the DuckDB oracles,
aimed at the METADATA layer instead of query semantics — the
interleavings (rename after rollback, expire between epochs,
compaction mid-lineage) are exactly where hand-written tests thin out.

The model is field-LINEAGE based (Iceberg's field-ID semantics, which
the name-mapping layer re-expresses over parquet name resolution): a
rename keeps the lineage, a drop ends it, a re-add under the same name
starts a fresh lineage that reads null from older rows, and rollback
restores rows keyed by lineage so renames/re-adds since the target
resolve exactly as the epoch-mapped file read does.

Deterministic: seeds are fixed, so a failure reproduces exactly.
"""

from __future__ import annotations

import random

import pytest

from local_datalakehouse_phase2_spark.lakehouse import (
    Lakehouse,
    expire_snapshots,
    rewrite_data_files,
    rewrite_manifests,
    rollback_to_snapshot,
)


class Model:
    def __init__(self):
        self._next_lid = 0
        self.cols: list[tuple[str, int]] = [("k", self._lid()), ("v", self._lid())]
        self.rows: dict[int, dict[int, object]] = {}  # key -> {lid: value}
        self.history: list[dict[int, dict[int, object]]] = []

    def _lid(self) -> int:
        self._next_lid += 1
        return self._next_lid

    def names(self) -> list[str]:
        return [n for n, _ in self.cols]

    def snapshot(self):
        self.history.append({k: dict(r) for k, r in self.rows.items()})

    def append(self, keys, col_vals):
        for k in keys:
            self.rows[k] = {
                lid: col_vals(k, n) for n, lid in self.cols if n != "k"
            }
        self.snapshot()

    def overwrite(self, keys, col_vals):
        self.rows = {}
        self.append(keys, col_vals)

    def delete_where_mod(self, m) -> bool:
        before = len(self.rows)
        self.rows = {k: r for k, r in self.rows.items() if k % m != 0}
        changed = len(self.rows) != before
        if changed:
            self.snapshot()
        return changed

    def rename(self, old, new):
        self.cols = [(new if n == old else n, lid) for n, lid in self.cols]
        self.snapshot()  # metadata-only; rows keyed by lineage untouched

    def drop(self, name):
        self.cols = [(n, lid) for n, lid in self.cols if n != name]
        self.snapshot()

    def add(self, name):
        self.cols.append((name, self._lid()))  # FRESH lineage: old rows null
        self.snapshot()

    def rollback(self, hist_idx):
        # restores ROWS (files); the current schema/lineage set persists
        self.rows = {k: dict(r) for k, r in self.history[hist_idx].items()}
        self.snapshot()

    def visible(self):
        return {
            tuple(
                [k] + [r.get(lid) for n, lid in self.cols if n != "k"]
            )
            for k, r in self.rows.items()
        }


def _df(spark, keys, names, col_vals):
    rows = [tuple([k] + [col_vals(k, c) for c in names if c != "k"]) for k in keys]
    ddl = ", ".join(f"{c} bigint" if c == "k" else f"{c} string" for c in names)
    return spark.createDataFrame(rows, ddl)


@pytest.mark.parametrize("seed", [11, 23, 47, 71])
def test_random_lifecycles_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    lake = Lakehouse(spark, str(tmp_path / f"wh{seed}"))
    lake.create_namespace("p")
    t = lake.create_table(
        f"p.t{seed}", schema="k bigint, v string", properties={"gc.enabled": "true"}
    )
    model = Model()
    next_key = 0
    col_gen = 0  # fresh names for renames; re-adds deliberately REUSE
    snap_to_hist: dict[int, int] = {}  # table snapshot id -> model history idx

    def col_vals(k, c):
        return f"{c}:{k}"

    def mark():
        snap_to_hist[t.log.latest_version()] = len(model.history) - 1

    def do_append(overwrite=False):
        nonlocal next_key
        keys = list(range(next_key, next_key + rng.randint(1, 4)))
        next_key += len(keys)
        df = _df(spark, keys, model.names(), col_vals)
        if overwrite:
            t.overwrite(df)
            model.overwrite(keys, col_vals)
        else:
            t.append(df)
            model.append(keys, col_vals)
        mark()

    do_append()
    for _ in range(10):
        op = rng.choice(
            ["append", "append", "delete", "rename", "dropadd", "compact",
             "checkpoint", "expire", "overwrite", "rollback"]
        )
        if op == "append":
            do_append()
        elif op == "overwrite":
            do_append(overwrite=True)
        elif op == "delete":
            m = rng.choice([2, 3, 5])
            t.delete_where(f"k % {m} = 0")
            if model.delete_where_mod(m):
                mark()
        elif op == "rename":
            extras = [n for n in model.names() if n != "k"]
            if not extras:
                continue
            old = rng.choice(extras)
            col_gen += 1
            new = f"c{col_gen}"
            t.rename_column(old, new)
            model.rename(old, new)
            mark()
        elif op == "dropadd":
            extras = [n for n in model.names() if n != "k"]
            if not extras:
                continue
            victim = rng.choice(extras)
            if len(model.cols) == 2:
                # guard: can't drop the only non-key column's sibling —
                # widen first so the drop is legal
                col_gen += 1
                t.add_column(f"c{col_gen}", "string")
                model.add(f"c{col_gen}")
                mark()
            t.drop_column(victim)
            model.drop(victim)
            mark()
            if rng.random() < 0.7:
                # RE-ADD the same name: a fresh lineage — older rows
                # must read null, never the dead bytes
                t.add_column(victim, "string")
                model.add(victim)
                mark()
        elif op == "compact":
            rewrite_data_files(t, target_file_size_bytes=1 << 30, min_input_files=1)
        elif op == "checkpoint":
            rewrite_manifests(t)
        elif op == "expire":
            expire_snapshots(t, retain_last=3)
        elif op == "rollback":
            targets = sorted(v for v in snap_to_hist if v in t.log.versions())
            if not targets:
                continue
            v = rng.choice(targets)
            rollback_to_snapshot(t, v)
            model.rollback(snap_to_hist[v])
            mark()

        assert [f.name for f in t.schema().fields] == model.names(), f"seed={seed} op={op}"
        got = {tuple(r) for r in t.read().collect()}
        want = model.visible()
        assert got == want, f"seed={seed} op={op} diff={got ^ want}"
