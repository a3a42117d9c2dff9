"""Incremental dedup against a persisted band-key index (round 12;
VERDICT r11 item 5): batch-incremental results equal from-scratch, the
index upsert is ONE snapshot commit, and replays are idempotent."""

from __future__ import annotations

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


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_incremental_equals_from_scratch_and_one_commit(spark, tmp_path):
    d = parallel_scan(spark, SF, "documents")
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)

    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    idx = lake.create_table("lab.bands", schema="doc_id bigint, band int, bh bigint")
    idx.append(band_keys(old))
    versions_after_backfill = len(idx.log.versions())

    seed = verified_jaccard(lsh_candidate_pairs(old).select("doc_a", "doc_b"), d)
    inc = dedup_incremental(new, idx, d)
    incremental_total = _pairs(seed) | _pairs(inc)

    # exactly ONE commit for the index upsert
    assert len(idx.log.versions()) == versions_after_backfill + 1
    assert idx.log.read_entry(idx.log.latest_version()).operation == "merge"

    # from-scratch over the union must agree pair-for-pair
    scratch = verified_jaccard(lsh_candidate_pairs(d).select("doc_a", "doc_b"), d)
    assert incremental_total == _pairs(scratch)
    assert incremental_total  # non-vacuous: the corpus has dupes

    # the index now covers the whole corpus
    assert idx.read().select("doc_id").distinct().count() == (
        band_keys(d).select("doc_id").distinct().count()
    )


def test_replay_is_idempotent(spark, tmp_path):
    d = parallel_scan(spark, SF, "documents")
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)

    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    idx = lake.create_table("lab.bands", schema="doc_id bigint, band int, bh bigint")
    idx.append(band_keys(old))

    first = _pairs(dedup_incremental(new, idx, d))
    n_rows = idx.read().count()
    # the crashed-ingest replay: same batch again
    second = _pairs(dedup_incremental(new, idx, d))
    assert idx.read().count() == n_rows  # merge upsert added nothing
    assert second >= first  # same cross/batch dupes still reported
