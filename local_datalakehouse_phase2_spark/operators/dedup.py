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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _minhash_signature(shingle_col):
    """array<bigint> of N_HASHES minhash values: base xxhash64 per
    shingle, then k affine permutations, min per permutation."""
    hashes = F.transform(shingle_col, lambda s: F.xxhash64(s))

    # i-th hash family = xxhash64(base_hash, i): a seeded re-hash, which
    # avoids 64-bit multiply overflow under ANSI mode. The lambda MUST
    # take exactly one parameter: F.transform treats a two-parameter
    # lambda as (element, index), so a captured-via-default `i=i` would
    # be silently overridden by the array index.
    def family(i: int):
        return F.array_min(F.transform(hashes, lambda h: F.xxhash64(h, F.lit(i))))

    return F.array(*[family(i) for i in range(N_HASHES)])


def with_minhash(d: DataFrame) -> DataFrame:
    """documents -> (doc_id, sig: array<bigint>) using xxhash64(shingle_hash, i)
    as the i-th hash family (seeded re-hash, ANSI-overflow-safe)."""
    return d.select("doc_id", _minhash_signature(_shingles()).alias("sig"))


def lsh_candidate_pairs(d: DataFrame) -> DataFrame:
    """MinHash signatures -> LSH band buckets -> within-bucket pairs.
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b."""
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
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "band", "bh"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "band", "bh"
    )
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / F.lit(float(N_HASHES))
    )
    return pairs.select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))


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
    # sum over shingles of (+1 if hash bit set else -1) > 0.
    # Single pass over the shingle hashes accumulating a 64-counter
    # array, then fold counters into the bit pattern — the shingle
    # transform is evaluated once per row, not once per bit.
    sim = F.expr(
        f"""
        aggregate(
          aggregate(
            transform({_shingles_sql()}, t -> xxhash64(t)),
            array_repeat(0L, 64),
            (acc, h) -> zip_with(acc, sequence(0, 63),
              (a, b) -> a + CASE WHEN (h >> b) & 1 = 1 THEN 1L ELSE -1L END)),
          named_struct('v', 0L, 'b', 0),
          (st, c) -> named_struct(
            'v', st.v | CASE WHEN c > 0 THEN shiftleft(1L, st.b) ELSE 0L END,
            'b', st.b + 1),
          st -> st.v)
        """
    )
    sigs = d.select("doc_id", sim.alias("simhash"))
    # 8 bands of 8 bits: any pair with hamming <= 7 shares at least one
    # exact band (pigeonhole), so the <=6 threshold below loses nothing.
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
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "bh")
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "bh")
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(sim_a ^ sim_b)"))
    )
    return (
        pairs.filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )
