"""Round-13 race self-review (VERDICT r12 items 3 and 7).

Concurrent incremental dedup: two writer batches racing on one
persisted band-key index must together emit exactly the pair set the
serial schedule emits — the delta re-join in dedup_incremental is the
mechanism (a merge CONFLICT cannot signal this race: disjoint batches
upsert disjoint keys and neither copy-on-write merge rewrites a common
file, so both commits succeed silently).

Two real Lakehouse writers on one warehouse path share nothing but the
on-disk log; the barrier forces the pathological interleaving (both
read the index as of entry BEFORE either commits), which is the exact
schedule the serial restriction existed to forbid.
"""

from __future__ import annotations

import threading
import types

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.lakehouse import Lakehouse
from local_datalakehouse_phase2_spark.operators.dedup import (
    band_keys,
    dedup_incremental,
    lsh_candidate_pairs,
    verified_jaccard,
)
from local_datalakehouse_phase2_spark.sources.loaders import parallel_scan

SF = "/root/testdata/sf0.001"
IDX_SCHEMA = "doc_id bigint, band int, bh bigint"


def _batches(spark):
    docs = parallel_scan(spark, SF, "documents")
    return (
        docs,
        docs.filter(F.col("doc_id") % 3 == 0),  # backfilled base
        docs.filter(F.col("doc_id") % 3 == 1),  # writer A's batch
        docs.filter(F.col("doc_id") % 3 == 2),  # writer B's batch
    )


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_concurrent_incremental_dedup_equals_serial(spark, tmp_path):
    docs, base, batch_a, batch_b = _batches(spark)

    # --- serial reference schedule -----------------------------------
    lake_s = Lakehouse(spark, str(tmp_path / "serial"))
    lake_s.create_namespace("lab")
    idx_s = lake_s.create_table("lab.bands", schema=IDX_SCHEMA)
    idx_s.append(band_keys(base))
    serial = _pairs(dedup_incremental(batch_a, idx_s, docs)) | _pairs(
        dedup_incremental(batch_b, idx_s, docs)
    )
    assert serial, "fixture has cross-batch dupes by construction"

    # --- racing schedule: both writers enter before either commits ---
    lake_setup = Lakehouse(spark, str(tmp_path / "race"))
    lake_setup.create_namespace("lab")
    lake_setup.create_table("lab.bands", schema=IDX_SCHEMA).append(band_keys(base))

    barrier = threading.Barrier(2, timeout=120)
    results: dict[str, set] = {}
    errors: list[BaseException] = []

    def writer(name: str, batch):
        try:
            # a REAL second writer: its own Lakehouse/table objects on
            # the shared warehouse path, nothing shared in memory
            idx = Lakehouse(spark, str(tmp_path / "race")).table("lab.bands")
            orig = idx.merge

            def stalled_merge(self, *a, **kw):
                # both writers have finished their entry-time index read
                # and candidate generation; release them into the commit
                # together
                barrier.wait()
                return orig(*a, **kw)

            idx.merge = types.MethodType(stalled_merge, idx)
            # force the entry-time read to happen pre-barrier: the
            # protocol pins v_entry first, so just run the whole call —
            # the merge hook IS the interleave point
            results[name] = _pairs(dedup_incremental(batch, idx, docs))
        except BaseException as e:  # surfaced after join
            errors.append(e)

    ta = threading.Thread(target=writer, args=("a", batch_a))
    tb = threading.Thread(target=writer, args=("b", batch_b))
    ta.start(), tb.start()
    ta.join(300), tb.join(300)
    assert not errors, errors
    assert not barrier.broken

    # completeness: the union of the racers' outputs equals the serial
    # schedule's pair set — the delta re-join recovered every
    # cross-batch pair the entry-time reads missed
    assert results["a"] | results["b"] == serial

    # the race actually happened AND was recovered: at least one racer
    # emitted a pair whose other side is in the opposite batch (neither
    # side's entry-time index contained the other's docs)
    a_ids = {r.doc_id for r in batch_a.select("doc_id").collect()}
    b_ids = {r.doc_id for r in batch_b.select("doc_id").collect()}
    cross = {
        (x, y)
        for (x, y) in serial
        if (x in a_ids and y in b_ids) or (x in b_ids and y in a_ids)
    }
    assert cross, "fixture must contain cross-batch dupes for this test to bite"
    assert cross <= (results["a"] | results["b"])

    # and the index itself lost no keys: both batches' band keys landed
    idx_final = Lakehouse(spark, str(tmp_path / "race")).table("lab.bands").read()
    n_expected = (
        band_keys(base).count() + band_keys(batch_a).count() + band_keys(batch_b).count()
    )
    assert idx_final.count() == n_expected


def test_unraced_incremental_dedup_skips_delta_scan(spark, tmp_path):
    """The common serial case must not pay for the concurrency fix: an
    unraced call's post-commit window is empty and _index_delta
    short-circuits to None (no extra Spark jobs)."""
    from local_datalakehouse_phase2_spark.operators import dedup as dd

    docs, base, batch_a, _ = _batches(spark)
    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    idx = lake.create_table("lab.bands", schema=IDX_SCHEMA)
    idx.append(band_keys(base))

    calls = []
    orig = dd._index_delta

    def spy(index_table, v_from, v_to):
        out = orig(index_table, v_from, v_to)
        calls.append((v_from, v_to, out))
        return out

    dd._index_delta = spy
    try:
        got = _pairs(dedup_incremental(batch_a, idx, docs))
    finally:
        dd._index_delta = orig
    assert calls and calls[0][2] is None  # empty window -> no delta work
    # and the serial result is the ordinary one
    want = _pairs(
        verified_jaccard(
            lsh_candidate_pairs(docs.filter(F.col("doc_id") % 3 != 2)).select(
                "doc_a", "doc_b"
            ),
            docs,
        )
    ) - _pairs(
        verified_jaccard(lsh_candidate_pairs(base).select("doc_a", "doc_b"), docs)
    )
    assert got >= want  # every pair involving a new doc is present


def test_incremental_dedup_vs_index_compaction(spark, tmp_path):
    """rewrite_data_files lands on the index table INSIDE a batch's
    protocol window (between its entry-time read and its merge). The
    compaction's `replace` entry makes the delta window non-append-only
    (read_incremental refuses), so _index_delta must take the
    version-pinned set-difference fallback — and since compaction is
    value-neutral, that delta is EMPTY: no spurious pairs, same output
    as the unraced run, index content intact."""
    import types

    from local_datalakehouse_phase2_spark.lakehouse import rewrite_data_files
    from local_datalakehouse_phase2_spark.operators import dedup as dd

    docs, base, batch_a, _ = _batches(spark)

    # unraced reference
    lake_s = Lakehouse(spark, str(tmp_path / "plain"))
    lake_s.create_namespace("lab")
    idx_s = lake_s.create_table("lab.bands", schema=IDX_SCHEMA)
    idx_s.append(band_keys(base))
    want = _pairs(dedup_incremental(batch_a, idx_s, docs))

    # raced: compaction fires while the batch is mid-protocol
    lake = Lakehouse(spark, str(tmp_path / "raced"))
    lake.create_namespace("lab")
    idx = lake.create_table("lab.bands", schema=IDX_SCHEMA)
    # several small files so the compaction has real work
    for part in (0, 1, 2):
        idx.append(band_keys(base.filter(F.col("doc_id") % 9 == part * 3)))

    compactor = Lakehouse(spark, str(tmp_path / "raced")).table("lab.bands")
    orig_merge = idx.merge

    def merge_after_compaction(self, *a, **kw):
        rewrite_data_files(compactor, min_input_files=2)
        return orig_merge(*a, **kw)

    idx.merge = types.MethodType(merge_after_compaction, idx)

    deltas = []
    orig_delta = dd._index_delta

    def spy(index_table, v_from, v_to):
        out = orig_delta(index_table, v_from, v_to)
        deltas.append(out)
        return out

    dd._index_delta = spy
    try:
        got = _pairs(dedup_incremental(batch_a, idx, docs))
    finally:
        dd._index_delta = orig_delta

    assert got == want
    # the window was non-empty (the replace entry) and the fallback
    # produced a value-level delta of zero rows — compaction moved
    # bytes, not facts
    assert deltas and deltas[0] is not None
    assert deltas[0].count() == 0
    final = Lakehouse(spark, str(tmp_path / "raced")).table("lab.bands").read()
    assert final.count() == band_keys(base).count() + band_keys(batch_a).count()


def test_tag_create_vs_drop_table_serialized(spark, tmp_path):
    """create_tag's {pin walk + record write} and drop_table's {pin
    guard + rmtree} are mutually atomic under the catalog-refs registry
    lock (r13): a drop racing a tag create can no longer interleave
    into the torn state where a fresh tag pins a just-vanished table.
    Forced schedule: the creator stalls MID-WALK (holding the lock);
    the dropper must block, then lose to the pin guard."""
    import threading
    import types
    import time as _time

    from local_datalakehouse_phase2_spark.lakehouse import CatalogError

    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    for name in ("a", "b"):
        t = lake.create_table(f"lab.{name}", schema="k bigint")
        t.append(spark.range(3).selectExpr("id AS k"))

    entered, release = threading.Event(), threading.Event()
    creator_lake = Lakehouse(spark, str(tmp_path / "w"))
    orig_tables = type(creator_lake).tables

    def slow_tables(self, ns, **kw):
        out = orig_tables(self, ns, **kw)
        entered.set()
        release.wait(20)  # stall mid-walk, registry lock held
        return out

    creator_lake.tables = types.MethodType(slow_tables, creator_lake)
    errors: list[BaseException] = []
    drop_result: list[str] = []

    def creator():
        try:
            creator_lake.create_tag("pinit")
        except BaseException as e:
            errors.append(e)

    def dropper():
        entered.wait(20)
        try:
            Lakehouse(spark, str(tmp_path / "w")).drop_table("lab.a")
            drop_result.append("dropped")
        except CatalogError as e:
            drop_result.append(f"refused: {e}")

    tc, td = threading.Thread(target=creator), threading.Thread(target=dropper)
    tc.start(), td.start()
    entered.wait(20)
    _time.sleep(0.5)  # give the dropper time to reach the lock
    assert td.is_alive(), "dropper must BLOCK on the registry lock mid-walk"
    release.set()
    tc.join(30), td.join(30)
    assert not errors, errors
    # the creator won the lock, so its record landed first and the
    # dropper's guard saw the pin
    assert drop_result and drop_result[0].startswith("refused"), drop_result
    # the tag reads the still-alive table at its pin
    assert Lakehouse(spark, str(tmp_path / "w")).read(
        "lab.a", catalog_ref="pinit"
    ).count() == 3


def test_tag_create_after_drop_skips_vanished_table(spark, tmp_path):
    """Opposite serialization order: the drop wins the lock first, so
    the creator's walk simply never sees the table — the tag is born
    without the pin instead of born broken."""
    from local_datalakehouse_phase2_spark.lakehouse import CatalogError
    from local_datalakehouse_phase2_spark.lakehouse.catalog_refs import (
        CatalogRefError,
    )

    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    for name in ("a", "b"):
        t = lake.create_table(f"lab.{name}", schema="k bigint")
        t.append(spark.range(2).selectExpr("id AS k"))
    lake.drop_table("lab.a")
    lake.create_tag("after")
    with pytest.raises((CatalogError, CatalogRefError)):
        lake.read("lab.a", catalog_ref="after")
    assert lake.read("lab.b", catalog_ref="after").count() == 2


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
