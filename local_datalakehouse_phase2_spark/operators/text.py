"""Text-analysis operators over the `documents` table (north-star Phase 4).

Language-ID, quality scoring, token counting, and fingerprinting for an
LLM-training-data pipeline (SURVEY.md §2.11 north-star extensions). All
hot-path expressions are built-in Spark SQL functions — tokenization is
`split`, fingerprints are `md5`/`xxhash64`, ratios are array lambdas —
so everything stays in whole-stage codegen; no Python UDFs.

Scale: every operator here is a single scan + narrow projection, or a
scan + one hash-aggregate shuffle. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table, parallel_scan

# Tiny stopword list used for quality scoring (documents are lowercase,
# single-space tokenized word salad — see FIXTURES.md).
STOPWORDS = ("a", "the", "and", "of", "to", "in")


def tokens_col(col: str = "text"):
    return F.split(F.col(col), " ")


@register(
    "text_stats",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               ROUND(AVG(len(string_split(text, ' '))), 6) AS avg_tokens,
               ROUND(AVG(n_chars), 6) AS avg_chars,
               ROUND(AVG(CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))), 6) AS avg_chars_per_token
        FROM documents
        GROUP BY lang
    """,
    tags=("text", "agg"),
    doc="Token counting + length stats per language: the basic corpus census.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_table, NOT parallel_scan: the projection is one size(split())
    # per row — too cheap to repay a round-robin repartition of the raw
    # text (r8 measured the fan-out at 2.60× best-ever here). The
    # aggregate's partial/merge split already parallelizes the reduce.
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(tokens_col())
    return (
        d.select("lang", "n_chars", ntok.alias("ntok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("ntok"), 6).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.avg(F.col("n_chars").cast("double") / F.col("ntok")), 6).alias(
                "avg_chars_per_token"
            ),
        )
    )


@register(
    "lang_distribution",
    oracle="""
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang, source
    """,
    tags=("text", "agg"),
    doc="Corpus composition: document and character counts by (lang, source).",
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "token_frequency",
    oracle="""
        SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY freq DESC, token
        LIMIT 30
    """,
    tags=("text", "explode"),
    doc="Global token frequency top-30 via explode + hash aggregate. At 100 TB "
    "this is the canonical skew-prone explode→agg; partial aggregation keeps the "
    "shuffle proportional to vocabulary, not corpus size.",
)
def token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_table, NOT parallel_scan: explode feeds a hash aggregate whose
    # partial side combines map-side and whose merge side shuffles on the
    # token key across all cores — the explode itself is the only serial
    # part and it's a split(), far cheaper than repartitioning the corpus
    # (r8 measured the fan-out at 3.09× best-ever for this query).
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(30)
    )


@register(
    "doc_fingerprint",
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(text)) AS n_distinct_fp,
               MIN(md5(text)) AS min_fp
        FROM documents
        GROUP BY source
    """,
    tags=("text", "fingerprint"),
    doc="Content fingerprinting with md5 (engine-portable): distinct-content "
    "census per source — the first pass of any dedup pipeline.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallel_scan(spark, sf_dir, "documents")
    fp = F.md5(F.col("text"))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_distinct_fp"),
        F.min(fp).alias("min_fp"),
    )


@register(
    "quality_score",
    oracle=f"""
        SELECT doc_id,
               ntok,
               stop_ratio,
               ttr,
               CASE WHEN ntok BETWEEN 20 AND 120 THEN 1 ELSE 0 END
                 + CASE WHEN stop_ratio BETWEEN 0.01 AND 0.3 THEN 1 ELSE 0 END
                 + CASE WHEN ttr >= 0.35 THEN 1 ELSE 0 END AS quality_score
        FROM (
            SELECT doc_id,
                   len(toks) AS ntok,
                   ROUND(CAST(len(list_filter(toks, t -> t IN {STOPWORDS!r})) AS DOUBLE) / len(toks), 6) AS stop_ratio,
                   ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        )
        WHERE doc_id % 5 = 0
    """,
    tags=("text", "quality"),
    doc="Per-document quality scoring: token count band, stopword ratio, "
    "type-token ratio — three interpretable filters combined into a 0-3 score, "
    "all computed with array lambdas in one projection.",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallel_scan(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    toks = tokens_col()
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    ntok = F.size(toks)
    nstop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    ndistinct = F.size(F.array_distinct(toks))
    stop_ratio = F.round(nstop.cast("double") / ntok, 6)
    ttr = F.round(ndistinct.cast("double") / ntok, 6)
    in_band = F.when((ntok >= 20) & (ntok <= 120), 1).otherwise(0)
    stop_ok = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.3), 1).otherwise(0)
    ttr_ok = F.when(ttr >= 0.35, 1).otherwise(0)
    return d.select(
        "doc_id",
        ntok.alias("ntok"),
        stop_ratio.alias("stop_ratio"),
        ttr.alias("ttr"),
        (in_band + stop_ok + ttr_ok).alias("quality_score"),
    )


@register(
    "lang_id_ngram",
    oracle="""
        -- Deterministic end-to-end: every stage is integer counts with
        -- total-order tie-breaks, so the classifier is engine-portable.
        WITH doc_grams AS (
            -- list_distinct BEFORE unnest: per-doc dedup is an array op,
            -- so no corpus-wide DISTINCT shuffle exists in either engine
            SELECT doc_id, lang,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(length(substring(text, 1, 200)) - 2, 1) + 1),
                       i -> substring(substring(text, 1, 200), CAST(i AS INT), 3)))) AS gram
            FROM documents
        ),
        prof_counts AS (
            -- document frequency (docs containing the gram) over a
            -- deterministic 10% sample — profiles are fit on a sample,
            -- scoring touches the full corpus
            SELECT lang, gram, COUNT(*) AS freq
            FROM doc_grams WHERE doc_id % 10 = 0
            GROUP BY lang, gram
        ),
        profile AS (
            SELECT lang AS p_lang, gram
            FROM (SELECT lang, gram,
                         ROW_NUMBER() OVER (PARTITION BY lang
                                            ORDER BY freq DESC, gram) AS rk
                  FROM prof_counts) r
            WHERE rk <= 50
        ),
        scores AS (
            SELECT dg.doc_id, dg.lang, p.p_lang, COUNT(*) AS hits
            FROM doc_grams dg
            JOIN profile p USING (gram)
            GROUP BY dg.doc_id, dg.lang, p.p_lang
        ),
        pred AS (
            SELECT doc_id, lang, p_lang AS predicted_lang
            FROM (SELECT doc_id, lang, p_lang,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY hits DESC, p_lang) AS rk
                  FROM scores) r
            WHERE rk = 1
        )
        SELECT lang, predicted_lang, COUNT(*) AS n_docs
        FROM pred
        GROUP BY lang, predicted_lang
    """,
    tags=("text", "lang-id"),
    doc="Language identification by character-trigram profile: build per-lang "
    "trigram profiles from the labeled corpus (distributed agg), score each doc "
    "by profile overlap via a broadcast join, predict argmax. Self-contained "
    "n-gram heuristic — no external model.",
)
def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallel_scan(spark, sf_dir, "documents")
    # distinct char 3-grams of the first 200 chars: array_distinct runs
    # per-doc INSIDE the projection, so the corpus-wide DISTINCT shuffle
    # the naive formulation needs simply doesn't exist — at 100 TB that
    # shuffle (rows = total gram occurrences) would dominate the job
    grams = F.expr(
        "array_distinct(transform(sequence(1, greatest(length(substring(text,1,200))-2, 1),"
        " 1), i -> substring(substring(text,1,200), i, 3)))"
    )
    doc_grams = d.select("doc_id", "lang", F.explode(grams).alias("gram"))
    # per-lang profile: top-50 trigrams by document frequency, fit on a
    # deterministic 10% sample — the model branch reads 1/10th of the
    # corpus while scoring still covers all of it (at 100 TB you fit
    # profiles on a sample, never on the full corpus)
    from pyspark.sql import Window as W

    prof_counts = (
        doc_grams.filter(F.col("doc_id") % 10 == 0)
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("freq"))
    )
    w = W.partitionBy("lang").orderBy(F.col("freq").desc(), "gram")
    profile = (
        prof_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .select(F.col("lang").alias("p_lang"), "gram")
    )
    # score: doc-grams hitting each lang profile (broadcast: 5 langs * 50 grams)
    scores = (
        doc_grams.join(F.broadcast(profile), "gram")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.count("*").alias("hits"))
    )
    # argmax per doc as MIN(struct(-hits, p_lang)) — identical pick to
    # the previous ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits
    # DESC, p_lang) = 1 cut (hits is an exact count, so -hits orders
    # descending; struct comparison breaks ties on p_lang ascending),
    # but as an aggregate it gets map-side partial aggregation: the
    # per-doc exchange ships ONE pre-reduced row per doc instead of one
    # per (doc, profile-lang), and the Sort + WindowGroupLimit pass
    # disappears (guide §2.3 "aggregate before you shuffle" / §2.4).
    # Plan: Window+2 Sorts over a 3rd Exchange -> HashAggregate over
    # the same Exchange count; measured 1.67 s -> see OPTIMIZATION_r16.
    pred = (
        scores.groupBy("doc_id", "lang")
        .agg(F.min(F.struct((-F.col("hits")).alias("nh"), F.col("p_lang"))).alias("top"))
        .select("doc_id", "lang", F.col("top.p_lang").alias("predicted_lang"))
    )
    return pred.groupBy("lang", "predicted_lang").agg(F.count("*").alias("n_docs"))


@register(
    "token_count_bpe",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
                   AS total_bpe_tokens,
               ROUND(AVG(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                         / len(string_split(text, ' '))), 6) AS bpe_per_word
        FROM documents
        GROUP BY lang
    """,
    tags=("text", "tokenize"),
    doc="BPE-ish token counting: a subword-style regex (letter runs, digit "
    "runs, single punctuation — the GPT-2 pre-tokenizer shape) instead of "
    "whitespace words. regexp_extract_all stays JVM-side; the pattern uses "
    "only RE2-and-Java-common syntax so the DuckDB oracle tokenizes "
    "identically.",
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallel_scan(spark, sf_dir, "documents")
    # idx=0 => whole-match extraction (the default idx=1 wants a capture group)
    bpe = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    n_bpe = F.size(bpe)
    n_words = F.size(tokens_col())
    return (
        d.select("lang", n_bpe.alias("nb"), n_words.alias("nw"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nb").cast("bigint").alias("total_bpe_tokens"),
            F.round(F.avg(F.col("nb").cast("double") / F.col("nw")), 6).alias("bpe_per_word"),
        )
    )


WINNOW_K = 3  # k-gram size (words)
WINNOW_W = 4  # winnowing window (Schleimer et al., SIGMOD'03)


def winnowed_fingerprints(d: DataFrame) -> DataFrame:
    """(doc_id, fp) pairs: the winnowing fingerprint set of each doc —
    min hash of every WINNOW_W-window of k-gram hashes, deduplicated.

    Classic rolling-hash document fingerprinting: guarantees any shared
    run of >= WINNOW_K + WINNOW_W - 1 tokens between two docs shares a
    fingerprint. Columnar shape: k-gram hash array -> sliding-window
    min via transform over window starts -> explode distinct. (The
    O(1)-per-step rolling update of a scalar loop has no meaning in a
    vectorized plan; the window min is what defines the semantics.)

    Hash choice: md5 hex strings, compared lexicographically — any
    injective hash selects a valid winnowing (the guarantee only needs
    a total order on k-grams), and md5 is bit-identical across engines,
    so an external SQL engine can replay the EXACT fingerprint
    selection (the DuckDB oracle below does). xxhash64 would be ~2x
    cheaper per k-gram but is Spark-specific.
    """
    kh = F.expr(
        f"transform(sequence(0, greatest(size(split(text, ' ')) - {WINNOW_K}, 0)),"
        f" si -> md5(concat_ws(' ', slice(split(text, ' '), si + 1, {WINNOW_K}))))"
    )
    wins = F.expr(
        f"array_distinct(transform(sequence(0, greatest(size(kh) - {WINNOW_W}, 0)),"
        f" wi -> array_min(slice(kh, wi + 1, {WINNOW_W}))))"
    )
    return (
        d.select("doc_id", kh.alias("kh"))
        .select("doc_id", F.explode(wins).alias("fp"))
    )


@register(
    "winnow_fingerprint_overlap",
    # TRUE cross-engine oracle: the k-gram hash is md5 (bit-identical
    # in DuckDB) and window minima are lexicographic, so DuckDB replays
    # the exact winnowing selection and the exact pair counts.
    oracle=f"""
        WITH kg AS (
            SELECT doc_id, list_transform(range(1, greatest(len(w) - {WINNOW_K - 2}, 2)),
                   i -> md5(array_to_string(w[i:i+{WINNOW_K - 1}], ' '))) AS kh
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        ),
        fps AS (
            SELECT DISTINCT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(kh) - {WINNOW_W - 2}, 2)),
                               wi -> list_min(kh[wi:wi+{WINNOW_W - 1}])))) AS fp
            FROM kg
        ),
        buckets AS (
            SELECT fp FROM fps GROUP BY fp
            HAVING COUNT(*) > 1 AND COUNT(*) <= 1000
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
            FROM fps a JOIN buckets bk ON a.fp = bk.fp
            JOIN fps b ON b.fp = bk.fp AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, shared_fps FROM pairs
        WHERE shared_fps >= 2 ORDER BY doc_a, doc_b
    """,
    tags=("text", "fingerprint", "dedup"),
    doc=f"Winnowing (rolling-hash) fingerprint overlap: docs sharing >= 2 "
    f"window-min fingerprints (k={WINNOW_K}, w={WINNOW_W}) — the "
    "plagiarism-detection primitive. Pairing is a fingerprint-bucket group "
    "join (corpus-linear), never a doc cross join.",
)
def winnow_fingerprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallel_scan(spark, sf_dir, "documents")
    fps = winnowed_fingerprints(d)
    buckets = (
        fps.groupBy("fp")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= 1000))
    )
    pairs = (
        buckets.select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
    )
    return pairs.filter(F.col("shared_fps") >= 2).orderBy("doc_a", "doc_b")


# --- benchmark-contamination check (LLM training-data hygiene) --------

NGRAM_CONTAM = 8  # industry-typical 8..13-gram overlap window
EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 marks the held-out "eval set"


def _word_ngrams_sql(col: str, n: int) -> str:
    """array<string> of word n-grams (guarded: empty below n tokens)."""
    toks = f"split({col}, ' ')"
    return (
        f"CASE WHEN size({toks}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({toks}) - {n}),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, {n}))) END"
    )


@register(
    "contamination_check",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, source,
                   list_transform(range(1, len(w) - {NGRAM_CONTAM - 2}),
                                  i -> array_to_string(w[i:i+{NGRAM_CONTAM - 1}], ' ')) AS gs
            FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= {NGRAM_CONTAM}
        ),
        eval_grams AS (
            SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % {EVAL_MOD} = 0
        ),
        per_doc AS (
            SELECT g.doc_id, g.source,
                   COUNT(*) AS n_grams,
                   SUM(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
            FROM (SELECT doc_id, source, unnest(gs) AS g FROM grams) g
            LEFT JOIN eval_grams eg ON g.g = eg.g
            GROUP BY g.doc_id, g.source
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN n_hit * 2 >= n_grams THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated,
               ROUND(AVG(n_hit / n_grams), 6) AS avg_overlap
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """,
    tags=("text", "contamination", "llm-pipeline"),
    doc=f"Benchmark-contamination audit: flags corpus documents whose "
    f"{NGRAM_CONTAM}-gram overlap with a held-out eval set (doc_id % "
    f"{EVAL_MOD} == 0) is >= 50% — the standard n-gram decontamination "
    "check an LLM data pipeline runs before training. Eval grams are "
    "DISTINCT-ed then broadcast (eval sets are small by construction); "
    "the corpus side is one explode + broadcast semi-probe + per-doc "
    "aggregate — corpus-linear, no pairwise comparison, the shape that "
    "survives 100 TB. Eval docs stay in the scan and self-flag at "
    "overlap 1.0, proving the detector fires.",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallel_scan(spark, sf_dir, "documents")
    # cheap word-count filter instead of size(gs) > 0: Catalyst would
    # substitute the whole n-gram projection into the filter and
    # evaluate it twice (see dedup._has_shingles for the measured cost)
    grams = d.filter(
        F.expr(f"size(split(text, ' ')) >= {NGRAM_CONTAM}")
    ).select(
        "doc_id",
        "source",
        F.expr(_word_ngrams_sql("text", NGRAM_CONTAM)).alias("gs"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("gs").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        grams.select("doc_id", "source", F.explode("gs").alias("g"))
        .join(F.broadcast(eval_grams), "g", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_hit") * 2 >= F.col("n_grams")).cast("bigint")).alias(
                "n_contaminated"
            ),
            F.round(F.avg(F.col("n_hit") / F.col("n_grams")), 6).alias("avg_overlap"),
        )
        .orderBy("source")
    )


# --- PII scrubbing (LLM training-data hygiene) ------------------------

# same regex dialect subset works in Java (Spark) and RE2 (DuckDB)
EMAIL_RE = "[a-z0-9._]+@[a-z0-9]+[.][a-z]+"
PHONE_RE = "[0-9]{3}-[0-9]{4}"


@register(
    "pii_redaction",
    oracle=f"""
        WITH enriched AS (
            SELECT source,
                   text
                   || CASE WHEN doc_id % 11 = 0
                           THEN ' contact user' || doc_id || '@example.com now'
                           ELSE '' END
                   || CASE WHEN doc_id % 13 = 0
                           THEN ' or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           ELSE '' END AS text
            FROM documents
        ),
        scrubbed AS (
            SELECT source,
                   len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
                   len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
                   length(text) - length(
                       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                      '{PHONE_RE}', '<PHONE>', 'g')) AS chars_delta
            FROM enriched
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
               CAST(SUM(CASE WHEN n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
               CAST(SUM(n_emails + n_phones) AS BIGINT) AS total_redactions,
               CAST(SUM(chars_delta) AS BIGINT) AS chars_redacted_delta
        FROM scrubbed
        GROUP BY source
        ORDER BY source
    """,
    tags=("text", "pii", "llm-pipeline"),
    doc="PII scrub pass: regexp_extract_all to census emails/phones and "
    "a chained regexp_replace redaction, verified by per-source counts "
    "and the exact character delta the replacements produce. The corpus "
    "text is synthetic, so deterministic PII is injected in-plan (docs "
    "with doc_id%11==0 get an email, %13==0 a phone) — the regex "
    "operators under test are the real thing, JVM-side and codegen'd, "
    "one scan, no UDFs. At 100 TB this is the same single-pass map "
    "shape; patterns chosen in the dialect subset Java regex and RE2 "
    "evaluate identically.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallel_scan(spark, sf_dir, "documents")
    enriched = d.select(
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com now")),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" or call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    scrubbed = enriched.select(
        "source",
        F.size(F.expr(f"regexp_extract_all(text, '{EMAIL_RE}', 0)")).alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(text, '{PHONE_RE}', 0)")).alias("n_phones"),
        (
            F.length("text")
            - F.length(
                F.regexp_replace(
                    F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
                )
            )
        ).alias("chars_delta"),
    )
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_emails") > 0).cast("bigint")).alias("docs_with_email"),
            F.sum((F.col("n_phones") > 0).cast("bigint")).alias("docs_with_phone"),
            F.sum(F.col("n_emails") + F.col("n_phones")).cast("bigint").alias("total_redactions"),
            F.sum("chars_delta").cast("bigint").alias("chars_redacted_delta"),
        )
        .orderBy("source")
    )


# Gopher-style repetition thresholds (Rae et al. 2021 use char-mass
# fractions on web text; these are occurrence-count analogs calibrated
# to the synthetic corpus so each flag fires on a meaningful minority)
TOP_WORD_FRAC = 0.10
TOP_BIGRAM_FRAC = 0.07
MIN_BIGRAM_DIVERSITY = 0.90


@register(
    "doc_repetition_flags",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        uni AS (
            SELECT doc_id, lang,
                   MAX(c) AS top_w, SUM(c) AS n_w
            FROM (SELECT doc_id, lang, w, COUNT(*) AS c FROM w GROUP BY ALL)
            GROUP BY doc_id, lang
        ),
        g AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i+1])) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
            WHERE len(ws) >= 2
        ),
        bg AS (
            SELECT doc_id, MAX(c) AS top_g, SUM(c) AS n_g, COUNT(*) AS d_g
            FROM (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY ALL)
            GROUP BY doc_id
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN CAST(top_w AS DOUBLE) / n_w > {TOP_WORD_FRAC}
                        THEN 1 ELSE 0 END) AS BIGINT) AS top_word_flagged,
               CAST(SUM(CASE WHEN CAST(top_g AS DOUBLE) / n_g > {TOP_BIGRAM_FRAC}
                        THEN 1 ELSE 0 END) AS BIGINT) AS top_bigram_flagged,
               CAST(SUM(CASE WHEN CAST(d_g AS DOUBLE) / n_g < {MIN_BIGRAM_DIVERSITY}
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_diversity_flagged,
               CAST(SUM(CASE WHEN CAST(top_w AS DOUBLE) / n_w > {TOP_WORD_FRAC}
                         AND CAST(top_g AS DOUBLE) / n_g > {TOP_BIGRAM_FRAC}
                        THEN 1 ELSE 0 END) AS BIGINT) AS both_flagged
        FROM uni JOIN bg USING (doc_id)
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("text", "quality", "llm-pipeline"),
    doc="Gopher-style intra-document repetition audit (Rae et al. "
    "2021's repetition rules, occurrence-count form): per doc, the "
    "most-frequent-word fraction, most-frequent-bigram fraction, and "
    "bigram diversity (distinct/total), thresholded into removal "
    "flags and rolled up per language. Plan shape: two explode -> "
    "partial-agg passes (unigrams, bigrams) joined on doc_id — "
    "corpus-linear with map-side combine, no UDFs, no pairwise "
    "work; the same shape as a token census, which is what survives "
    "100 TB. Flags are integer-threshold deterministic, so counts "
    "oracle-check exactly.",
)
def doc_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallel_scan(spark, sf_dir, "documents")
    words = d.select("doc_id", "lang", F.explode(tokens_col()).alias("w"))
    uni = (
        words.groupBy("doc_id", "lang", "w")
        .count()
        .groupBy("doc_id", "lang")
        .agg(F.max("count").alias("top_w"), F.sum("count").alias("n_w"))
    )
    grams = d.select("doc_id", F.explode(F.expr(_word_ngrams_sql("text", 2))).alias("g"))
    bg = (
        grams.groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("top_g"),
            F.sum("count").alias("n_g"),
            F.count("*").alias("d_g"),
        )
    )
    per_doc = uni.join(bg, "doc_id")
    top_w_frac = F.col("top_w").cast("double") / F.col("n_w")
    top_g_frac = F.col("top_g").cast("double") / F.col("n_g")
    diversity = F.col("d_g").cast("double") / F.col("n_g")
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((top_w_frac > TOP_WORD_FRAC).cast("bigint")).alias("top_word_flagged"),
            F.sum((top_g_frac > TOP_BIGRAM_FRAC).cast("bigint")).alias("top_bigram_flagged"),
            F.sum((diversity < MIN_BIGRAM_DIVERSITY).cast("bigint")).alias(
                "low_diversity_flagged"
            ),
            F.sum(
                ((top_w_frac > TOP_WORD_FRAC) & (top_g_frac > TOP_BIGRAM_FRAC)).cast(
                    "bigint"
                )
            ).alias("both_flagged"),
        )
        .orderBy("lang")
    )
