"""Text-operator semantics not covered by the SQL oracle."""

from __future__ import annotations

from local_datalakehouse_phase2_spark.operators.text import lang_id_ngram


def test_lang_id_confusion_is_deterministic_and_total(spark, sf_small):
    rows = lang_id_ngram(spark, sf_small).collect()
    total = sum(r.n_docs for r in rows)
    assert total == 500  # every doc classified exactly once
    again = lang_id_ngram(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # the fixture corpus shares one vocabulary across langs (word salad),
    # so we assert structural sanity, not accuracy: every predicted lang
    # is one of the 5 real ones
    langs = {"de", "en", "es", "fr", "zh"}
    assert {r.predicted_lang for r in rows} <= langs


def test_winnow_fingerprints_match_python_oracle(spark, sf_small):
    """Winnowed fingerprint sets must equal a direct Python
    implementation of winnowing (k-gram min over sliding windows) for
    every doc — over the shared md5 k-gram hashes (string order),
    by comparing SET STRUCTURE: counts and pairwise overlaps."""
    import duckdb

    from local_datalakehouse_phase2_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnowed_fingerprints,
    )
    from local_datalakehouse_phase2_spark.sources.loaders import load_table

    d = load_table(spark, sf_small, "documents")
    got = {}
    for r in winnowed_fingerprints(d).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)

    # Python oracle on the raw text, with Spark-computed k-gram hashes
    # replaced by hash-free positions: winnowing selects window MINIMA,
    # so the selected POSITIONS are identical for any injective hash.
    # We therefore check per-doc fingerprint-set size against a Python
    # winnow over the Spark k-gram hash sequence itself.
    kh_rows = d.selectExpr(
        "doc_id",
        f"transform(sequence(0, greatest(size(split(text, ' ')) - {WINNOW_K}, 0),"
        f" 1), si -> md5(concat_ws(' ', slice(split(text, ' '), si + 1, {WINNOW_K})))) AS kh",
    ).collect()
    for r in kh_rows:
        kh = list(r.kh)
        want = set()
        for i in range(max(len(kh) - WINNOW_W, 0) + 1):
            want.add(min(kh[i : i + WINNOW_W]))
        assert got.get(r.doc_id, set()) == want, r.doc_id


def test_deterministic_sampling_is_stable_and_stratified(spark, sf_small):
    from pyspark.sql import functions as F

    from local_datalakehouse_phase2_spark.operators.sampling import (
        deterministic_sample,
        stratified_mix,
    )
    from local_datalakehouse_phase2_spark.sources.loaders import load_table

    docs = load_table(spark, sf_small, "documents")
    s1 = deterministic_sample(docs, F.col("doc_id"), 0.2)
    s2 = deterministic_sample(docs, F.col("doc_id"), 0.2)
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    assert ids1 == sorted(r.doc_id for r in s2.select("doc_id").collect())
    assert 0 < len(ids1) < docs.count()
    # supersampling: a higher rate strictly contains the lower-rate set
    ids_half = {r.doc_id for r in deterministic_sample(docs, F.col("doc_id"), 0.5).select("doc_id").collect()}
    assert set(ids1) <= ids_half
    mixed = stratified_mix(docs, "lang", F.col("doc_id"), {"en": 1.0})
    langs = {r.lang for r in mixed.select("lang").distinct().collect()}
    assert langs == {"en"}  # zero-rate strata dropped entirely
    assert mixed.count() == docs.filter(F.col("lang") == "en").count()  # rate 1.0 keeps all
