"""Deduplication operators over `documents` (north-star Phase 4).

Four families, all expressed with built-in Spark SQL array/hash
functions (JVM-side, codegen'd — no Python UDFs):

- exact:    md5 fingerprint group-by (dedup_exact, dedup_hash_census)
- MinHash:  word-shingle MinHash signatures + LSH banding; candidate
            pairs come from equi-joining band buckets, NEVER from a
            cross join (minhash_lsh_pairs)
- Jaccard:  exact shingle-set Jaccard computed only on LSH candidates
            (ngram_jaccard_dupes)
- SimHash:  64-bit token-hash sign-sum + 4x16-bit banding for
            Hamming-distance candidates (simhash_pairs)

Scale design (the whole point at 100 TB): near-dup detection is
shingle -> signature (narrow, linear) -> explode bands (x BANDS) ->
shuffle on (band, signature) -> join within buckets. Work is
proportional to corpus + bucket collisions, not corpus^2. Skewed
buckets (boilerplate text) would be salted or capped in production;
exact Jaccard verification only touches candidate pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..registry import register
from ..sources.loaders import load_table

N_HASHES = 32  # MinHash signature length
N_BANDS = 8  # LSH bands (4 rows per band) => catches J >~ 0.6
SHINGLE = 3  # words per shingle

def _shingles_sql(col: str = "text") -> str:
    return (
        f"transform(sequence(0, greatest(size(split({col}, ' ')) - {SHINGLE}, 0)),"
        f" si -> concat_ws(' ', slice(split({col}, ' '), si + 1, {SHINGLE})))"
    )


def _shingles(col: str = "text"):
    """Word SHINGLE-grams as an array<string> (built-in transform over
    token index sequence)."""
    return F.expr(_shingles_sql(col))


# type object, not a DDL string: string return types are parsed at
# decoration time and require an active SparkSession (breaks import)
@pandas_udf(LongType())
def _simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over 3-word shingles, vectorized per Arrow batch.

    Deterministic hashing via blake2b-8 (stable across processes,
    unlike Python's builtin hash). Majority vote per bit: bit b is set
    iff more than half the shingle hashes have bit b set.
    """
    bit_idx = np.arange(64, dtype=np.uint64)
    out = np.empty(len(text), dtype=np.int64)
    for i, t in enumerate(text):
        toks = t.split(" ")
        n = max(len(toks) - SHINGLE, 0)
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        " ".join(toks[j : j + SHINGLE]).encode(), digest_size=8
                    ).digest(),
                    "little",
                )
                for j in range(n + 1)
            ),
            dtype=np.uint64,
            count=n + 1,
        )
        ones = ((hs[:, None] >> bit_idx) & 1).sum(axis=0)
        sim = int(((ones * 2 > len(hs)).astype(np.uint64) << bit_idx).sum())
        out[i] = sim - (1 << 64) if sim >= 1 << 63 else sim
    return pd.Series(out)


def with_minhash(d: DataFrame) -> DataFrame:
    """documents -> (doc_id, sig: array<bigint>).

    i-th hash family = xxhash64(shingle_hash, i): a seeded re-hash,
    which avoids 64-bit multiply overflow under ANSI mode.

    Shape: explode shingles -> one base xxhash64 per shingle -> groupBy
    doc_id with N_HASHES min-aggregates. A pure array-expression version
    (array_min over transform, repeated per family) re-evaluates the
    shingle string-building N_HASHES times per row after Catalyst's
    projection collapse — measured ~6x slower. The explode shape hashes
    each shingle once, and the min-agg combines map-side, so the shuffle
    carries one 32-long row per (doc, partition), not the shingles.
    """
    sh = d.select("doc_id", F.explode(_shingles()).alias("s"))
    hashed = sh.select("doc_id", F.xxhash64("s").alias("h"))
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(F.xxhash64("h", F.lit(i))).alias(f"m{i}") for i in range(N_HASHES)]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(N_HASHES)]).alias("sig")
    )


MAX_BUCKET = 1000  # cap pathological buckets (boilerplate text) — see doc below


def lsh_candidate_pairs(d: DataFrame) -> DataFrame:
    """MinHash signatures -> LSH band buckets -> within-bucket pairs.
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b.

    Shape: ONE signature aggregation, ONE shuffle grouping (band,
    band-hash) buckets, then pair expansion inside each bucket via a
    double explode. (A self-join formulation computes the signature
    aggregation once per join side — the re-aliased branches defeat
    Spark's exchange reuse.) Buckets larger than MAX_BUCKET are dropped:
    they are boilerplate/degenerate text whose O(k^2) pairs would
    dominate the stage at corpus scale, and their members still pair up
    in the other, more selective bands.
    """
    rows_per_band = N_HASHES // N_BANDS
    sigs = with_minhash(d)
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}),"
                f" b -> named_struct('band', b, 'bh',"
                f" xxhash64(concat_ws(',', transform(slice(sig, b * {rows_per_band} + 1,"
                f" {rows_per_band}), x -> cast(x as string))))))"
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    buckets = (
        bands.groupBy("band", "bh")
        .agg(F.collect_list(F.struct("doc_id", "sig")).alias("ms"))
        .filter((F.size("ms") > 1) & (F.size("ms") <= MAX_BUCKET))
    )
    pairs = (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / F.lit(float(N_HASHES))
    )
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(est, 6).alias("est_jaccard"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
    )


@register(
    "dedup_exact",
    oracle="""
        SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, MIN(n_chars) AS n_chars
        FROM documents
        GROUP BY md5(text)
    """,
    tags=("dedup", "exact"),
    doc="Exact dedup: group by content fingerprint, keep the lowest doc_id. "
    "One hash-agg shuffle on md5(text); at 100 TB, group by the hash (fixed "
    "16 bytes), never by the raw text.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("fp"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.min("n_chars").alias("n_chars"),
        )
        .drop("fp")
    )


@register(
    "dedup_hash_census",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT sha256(text)) AS n_unique,
               CAST(COUNT(*) - COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_dupes
        FROM documents
        GROUP BY lang
    """,
    tags=("dedup", "exact"),
    doc="Duplication census per language with a cryptographic fingerprint "
    "(sha256) — collision-safe at any corpus size.",
)
def dedup_hash_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = F.sha2("text", 256)
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count("*") - F.countDistinct(fp)).cast("bigint").alias("n_dupes"),
    )


@register(
    "minhash_lsh_pairs",
    oracle=None,  # engine-specific hashing; accuracy vs brute force in tests/test_dedup.py
    tags=("dedup", "minhash", "lsh"),
    doc="MinHash(32) + LSH(8 bands x 4): near-duplicate candidate pairs with "
    "estimated Jaccard >= 0.5. Candidates come from band-bucket equi-joins — "
    "corpus-linear, no cross join.",
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        lsh_candidate_pairs(d)
        .filter(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "ngram_jaccard_dupes",
    oracle=None,  # verified against brute-force pairs in tests/test_dedup.py
    tags=("dedup", "jaccard"),
    doc="Exact 3-word-shingle Jaccard >= 0.6, computed ONLY on LSH candidate "
    "pairs (array_intersect/array_union on re-joined shingle sets).",
)
def ngram_jaccard_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(d).filter(F.col("est_jaccard") >= 0.3)
    sh = d.select("doc_id", F.array_distinct(_shingles()).alias("sh"))
    j = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
    )
    return (
        j.filter(F.col("jaccard") >= 0.6)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "simhash_pairs",
    oracle=None,  # verified against hamming brute force in tests/test_dedup.py
    tags=("dedup", "simhash"),
    doc="SimHash(64-bit over 3-word-shingle xxhash64) with 8x8-bit band "
    "blocking: near-dup pairs with Hamming distance <= 6. By pigeonhole, "
    "<=7 flipped bits over 8 bands leave one band identical, so recall "
    "within the threshold is exactly 1.0. bit_count on XOR gives the "
    "distance; banding keeps the join corpus-linear. At petabyte corpora, "
    "widen the fingerprint (e.g. 128-bit in two longs) to keep band keys "
    ">= 16 bits and buckets small.",
)
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Sign-sum per bit over 3-word-shingle features (unigram features
    # collapse on a small shared vocabulary): bit b of simhash = 1 iff
    # the majority of shingle hashes set bit b.
    #
    # Implementation choice, measured at sf0.1 (5k docs): a nested
    # array-lambda expression runs interpreted per element (~5 s); an
    # explode + 64 conditional-SUM-aggregate plan is codegen'd but the
    # generated method is so large that compilation alone costs ~9 s on
    # first run. The Arrow-batched UDF below — one (shingles x 64)
    # numpy bit matrix per doc — keeps the plan tiny and the math
    # vectorized, and is the fastest of the three cold AND warm.
    sigs = d.select("doc_id", _simhash64(F.col("text")).alias("simhash"))
    # 8 bands of 8 bits: any pair with hamming <= 7 shares at least one
    # exact band (pigeonhole), so the <=6 threshold below loses nothing.
    # Same one-shuffle bucket-grouping shape as lsh_candidate_pairs: a
    # band-key self-join would evaluate the sign-sum aggregate twice.
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 7), b -> named_struct('band', b,"
                " 'bh', (simhash >> (b * 8)) & 255))"
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    buckets = (
        bands.groupBy("band", "bh")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("ms"))
        .filter((F.size("ms") > 1) & (F.size("ms") <= MAX_BUCKET))
    )
    pairs = (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.first("hamming").alias("hamming"))
    )
    return (
        pairs.filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "embedding_cosine_dupes",
    oracle="""
        -- DOUBLE[] casts: DuckDB computes list_cosine_similarity in
        -- float32 for FLOAT[] inputs; Spark folds in float64
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id % 3 = 0 AND b.vec_id % 3 = 0
          AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.32
    """,
    tags=("dedup", "embedding"),
    doc="Embedding-cosine near-dup pairs (exact, oracle-checked): all pairs "
    "with cosine >= 0.32 on a keyed subset. The exact form is the correctness "
    "baseline; at corpus scale the SAME predicate runs on LSH candidates "
    "(ann_lsh_topk's bucketing) instead of a cross join — the fixture "
    "embeddings are near-uniform so the threshold sits at the top of the "
    "similarity distribution.",
)
def embedding_cosine_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 3 == 0)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    # sequential fold (zip_with + aggregate) matches DuckDB's sequential
    # list fold bit-for-bit; a pairwise-summing BLAS path could differ in
    # the last ulp right at the threshold boundary
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.transform("ea", lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform("eb", lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))
    cos = dot / (na * nb)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= 0.32)
        .select("vec_a", "vec_b", F.round("cos_sim", 4).alias("cos_sim"))
    )
