"""Training-sequence shaping operators: chunking, packing, mixing.

The last mile of an LLM data pipeline turns a cleaned corpus into
fixed-length training sequences:

- **Chunking** splits long documents into overlapping token windows
  (RAG indexing, long-doc pretraining prep).
- **Sequence packing** concatenates the corpus in a deterministic
  order and slices it into capacity-C sequences (GPT-style pretraining
  packing — documents may span sequence boundaries).
- **Mixture reweighting** computes per-source keep-rates so the OUTPUT
  token mixture matches target proportions, then samples
  deterministically (reproducible, retry-stable — see sampling.py).

Scale notes: chunking is row-local (explode over per-doc window
starts, no shuffle). Packing needs a GLOBAL prefix sum of token
counts; a naive `Window.orderBy(...)` without partitionBy collapses to
ONE partition — the classic scale trap — so `prefix_sum` implements
the two-phase distributed scan: range-repartition by key, per-
partition partial sums, driver-side cumulative offsets over the P
partition totals (metadata-sized), broadcast back, in-partition
window. Mixture reweighting is one tiny aggregate (sources × counts)
plus a broadcast-joined row-local filter.

The arithmetic is integer/exact everywhere the oracle recomputes it;
rate thresholds use floor(x * denom + 0.5) — identical in Python and
SQL, unlike Python's banker's round().
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..localrows import local_df
from ..registry import register
from ..sources.loaders import load_table

# whitespace tokens: the same notion text_stats/token_count_bpe use;
# a real pipeline swaps in its tokenizer's counts upstream
TOKENS = "size(split(text, ' '))"

CHUNK_TOKENS = 64  # window size
CHUNK_STRIDE = 48  # 16-token overlap
PACK_CAPACITY = 512  # training sequence length


def _bucket_of(col, bounds, lo: int = 0, hi: int | None = None):
    """Bucket id of `col` against sorted `bounds` — a balanced
    comparison tree, so each row evaluates O(log P) comparisons instead
    of the O(P) linear `F.aggregate` scan an earlier version used
    (noise at P=32; a few thousand expression ops per row at the
    thousands of buckets a 100 TB sort wants). Semantics identical to
    counting bounds strictly below the key: NULL keys fall through
    every `>` to bucket `lo`, duplicate bounds partition ties the same
    way the count did.
    """
    if hi is None:
        hi = len(bounds)
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(
        col > F.lit(bounds[mid]), _bucket_of(col, bounds, mid + 1, hi)
    ).otherwise(_bucket_of(col, bounds, lo, mid))


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    partitions: int = 32,
    materialize: bool = True,
) -> DataFrame:
    """Distributed exclusive prefix sum of `value_col` in `order_col`
    (numeric) order — without ever collapsing to one partition.

    Phase 1: split the key range into ~equal-count buckets at FIXED
    bound values (one approxQuantile pass). Phase 2: per-bucket totals
    -> driver (P rows, metadata-sized) -> cumulative offset per bucket.
    Phase 3: broadcast offsets, in-bucket running sum (window
    PARTITIONED by the bucket id, so no global sort on one node).

    The bucket id MUST be a pure function of the row. An earlier
    version derived it from `repartitionByRange` +
    `spark_partition_id()`, letting phase 2 and phase 3 re-execute the
    shuffle in separate jobs — and RangePartitioner's sampled bounds
    are NOT stable across executions here (measured at sf1: two
    back-to-back jobs over the same 50k-doc frame placed every range
    boundary differently, mis-assigning phase-2 offsets to 48k of 50k
    rows — silent corruption that sf0.01/sf0.1 never surfaced). Fixed
    bounds computed once make every phase agree by construction, on
    any partitioning, under AQE replans and task retries; the bounds
    only need to be roughly balanced, never exact, so the one-pass
    sketch is enough. This is also one shuffle cheaper: the window's
    hash partitioning on the bucket id is the only full shuffle.
    """
    from pyspark.sql.types import NumericType

    key_type = df.schema[order_col].dataType
    if not isinstance(key_type, NumericType):
        raise TypeError(
            f"prefix_sum order_col {order_col!r} must be numeric (got "
            f"{key_type.simpleString()}): the fixed-bound bucketing uses "
            "approxQuantile, which only sketches numeric columns. Map "
            "string/date/timestamp keys to a numeric surrogate "
            "(unix_timestamp, xxhash64) upstream."
        )
    qs = [i / partitions for i in range(1, partitions)]
    # explicit single-column projection: the sketch pass must scan the
    # order key alone, never the (possibly expensive) value expression
    bounds = (
        df.select(order_col).stat.approxQuantile(order_col, qs, 0.001)
        if partitions > 1
        else []
    )
    # r16: materialize the bucketed frame — phase 2 (totals collect)
    # and the consumer's phase-3 job each re-evaluated `df` from
    # scratch (for sequence_packing that is the whole text-split
    # pipeline twice; for training_data_pipeline the dedup aggregate).
    # Callers already project `df` down to (order, value) columns, so
    # the checkpoint is a few narrow longs per row — far cheaper at any
    # scale than a second full evaluation (guide §5: cut lineage when
    # an intermediate is genuinely reused). Callers whose input is
    # already a cheap projection of a materialized frame pass
    # materialize=False and skip the barrier (ADVICE r16: double
    # checkpoint in training_data_pipeline); correctness never depends
    # on it — the bucket id is a pure function of the row and the
    # driver-computed bounds, so phases 2/3 agree on any re-evaluation.
    part = df.withColumn("__pid", _bucket_of(F.col(order_col), bounds))
    if materialize:
        part = part.localCheckpoint()
    totals = {
        r["__pid"]: r["total"]
        for r in part.groupBy("__pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("total"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(max(totals) + 1 if totals else 0):
        offsets.append((pid, acc))
        acc += totals.get(pid, 0)
    spark = df.sparkSession
    off = local_df(spark, offsets or [(0, 0)], "__pid int, __offset long")
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        part.join(F.broadcast(off), "__pid")
        .withColumn(
            out_col,
            F.col("__offset") + F.coalesce(F.sum(value_col).over(w), F.lit(0)),
        )
        .drop("__pid", "__offset")
    )


@register(
    "doc_chunking",
    oracle=f"""
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        chunks AS (
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_id,
                   len(w) AS n_tokens_doc,
                   least(len(w) - (i * {CHUNK_STRIDE}), {CHUNK_TOKENS}) AS n_tokens,
                   md5(array_to_string(
                       w[(i * {CHUNK_STRIDE} + 1):(i * {CHUNK_STRIDE} + {CHUNK_TOKENS})],
                       ' ')) AS chunk_hash
            FROM docs,
                 LATERAL unnest(range(0, CAST(
                     greatest(ceil((len(w) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0), 0)
                     AS BIGINT) + 1)) AS t(i)
        )
        SELECT doc_id, chunk_id, n_tokens, chunk_hash
        FROM chunks
        WHERE doc_id % 20 = 0
        ORDER BY doc_id, chunk_id
    """,
    tags=("packing", "llm-pipeline", "text"),
    doc=f"Fixed token-window chunking with overlap (window {CHUNK_TOKENS}, "
    f"stride {CHUNK_STRIDE}) — the RAG-indexing / long-doc-prep primitive. "
    "Row-local: one explode over per-doc window starts, zero shuffle; the "
    "chunk hash (md5, bit-identical in DuckDB) stands in for the chunk "
    "text so the result stays metadata-sized. The oracle recomputes the "
    "exact chunk boundaries and hashes on a 1-in-20 doc sample.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter("doc_id % 20 = 0")
    w = F.expr("split(text, ' ')")
    n_chunks = (
        F.greatest(
            F.ceil((F.size(w) - F.lit(CHUNK_TOKENS)) / F.lit(float(CHUNK_STRIDE))),
            F.lit(0),
        ).cast("bigint")
        + 1
    )
    return (
        d.select(
            "doc_id",
            w.alias("w"),
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.least(
                F.size("w") - F.col("chunk_id") * CHUNK_STRIDE, F.lit(CHUNK_TOKENS)
            ).cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("w"),
                        F.col("chunk_id") * CHUNK_STRIDE + 1,
                        CHUNK_TOKENS,
                    ),
                )
            ).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@register(
    "sequence_packing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        pref AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS start_tok
            FROM toks
        ),
        placed AS (
            -- '//' is DuckDB integer division; '/' would float-divide
            -- and CAST(...) ROUNDS, silently shifting boundary docs
            SELECT doc_id, source, n_tokens,
                   CAST(start_tok // {PACK_CAPACITY} AS BIGINT) AS seq_id,
                   CAST((start_tok + n_tokens - 1) // {PACK_CAPACITY} AS BIGINT)
                       AS end_seq
            FROM pref WHERE n_tokens > 0
        )
        SELECT CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_sequences,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN end_seq > seq_id THEN 1 ELSE 0 END) AS BIGINT)
                   AS boundary_spanning_docs,
               CAST(MAX(end_seq) + 1 AS BIGINT) AS last_sequence,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM placed
    """,
    tags=("packing", "llm-pipeline"),
    doc=f"GPT-style sequence packing: concatenate the corpus in doc_id "
    f"order and slice into {PACK_CAPACITY}-token training sequences "
    "(documents may span boundaries — the standard pretraining packing "
    "that wastes zero tokens). The global token prefix-sum is the "
    "two-phase distributed scan (range repartition + per-partition "
    "totals -> driver offsets (P rows) -> broadcast + in-partition "
    "window) — NEVER a single-partition Window.orderBy, which is the "
    "100 TB scale trap. The oracle recomputes placement with a plain "
    "SQL window cumsum and must agree exactly.",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(TOKENS).cast("long").alias("n_tokens")
    )
    placed = (
        prefix_sum(d, "doc_id", "n_tokens", "start_tok")
        .filter("n_tokens > 0")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("start_tok") / PACK_CAPACITY).alias("seq_id"),
            F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / PACK_CAPACITY).alias(
                "end_seq"
            ),
        )
    )
    return placed.agg(
        F.countDistinct("seq_id").alias("n_sequences"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum((F.col("end_seq") > F.col("seq_id")).cast("long")).alias(
            "boundary_spanning_docs"
        ),
        (F.max("end_seq") + 1).alias("last_sequence"),
        F.count("*").alias("n_docs"),
    )


MIX_TARGET = {"src0": 0.5, "src1": 0.3, "src2": 0.2}  # token-share targets
MIX_DENOM = 100000


@register(
    "mixture_reweight",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
            FROM documents WHERE source IN ('src0', 'src1', 'src2')
        ),
        observed AS (
            SELECT source, SUM(n_tokens) AS t FROM toks GROUP BY source
        ),
        targets(source, p) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
        scale AS (
            SELECT MIN(o.t / tg.p) AS k
            FROM observed o JOIN targets tg USING (source)
        ),
        rates AS (
            SELECT o.source,
                   CAST(FLOOR(LEAST(tg.p * s.k / o.t, 1.0) * {MIX_DENOM} + 0.5)
                        AS BIGINT) AS keep_below
            FROM observed o JOIN targets tg USING (source), scale s
        ),
        kept AS (
            SELECT tk.source, tk.n_tokens
            FROM toks tk JOIN rates r USING (source)
            WHERE tk.doc_id % {MIX_DENOM} < r.keep_below
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS kept_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
        FROM kept GROUP BY source ORDER BY source
    """,
    tags=("packing", "sampling", "llm-pipeline"),
    doc="Domain-mixture reweighting: hit target token shares (src0 50% / "
    "src1 30% / src2 20%) by DOWN-sampling every source to the feasible "
    "scale K = min(observed/target) — the binding source keeps rate 1.0, "
    "the rest shed surplus. Two passes: a sources-sized aggregate "
    "(driver math on a handful of rows), then a broadcast-joined "
    "row-local deterministic filter (pmod on doc_id — reproducible, "
    "retry-stable, pushdown-friendly; see sampling.py). Thresholds use "
    "floor(x*denom + 0.5), identical in Python and SQL (Python round() "
    "is banker's and would drift). Oracle recomputes the whole "
    "two-pass pipeline in SQL.",
)
def mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(*MIX_TARGET)
    ).select("doc_id", "source", F.expr(TOKENS).cast("long").alias("n_tokens"))
    observed = {
        r.source: r.t for r in d.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    k = min(observed[s] / p for s, p in MIX_TARGET.items())
    rates = [
        (s, int(math.floor(min(MIX_TARGET[s] * k / observed[s], 1.0) * MIX_DENOM + 0.5)))
        for s in sorted(MIX_TARGET)
    ]
    spec = local_df(spark, rates, "source string, keep_below long")
    return (
        d.join(F.broadcast(spec), "source")
        .filter(F.pmod(F.col("doc_id"), F.lit(MIX_DENOM)) < F.col("keep_below"))
        .groupBy("source")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
        .orderBy("source")
    )


@register(
    "training_data_pipeline",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, source, text,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        dedup AS (  -- exact dedup: min doc_id per text hash
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY md5(text) ORDER BY doc_id) AS rn
                FROM base
            ) WHERE rn = 1
        ),
        quality AS (  -- length gate + mean-word-length gate
            SELECT * FROM dedup
            WHERE n_tokens BETWEEN 20 AND 1000
              AND (length(text) - n_tokens + 1.0) / n_tokens < 12
        ),
        mixed AS (  -- deterministic 60% sample of sources src0..src9
            SELECT * FROM quality
            WHERE source IN ('src0','src1','src2','src3','src4',
                             'src5','src6','src7','src8','src9')
              AND doc_id % 1000 < 600
        ),
        pref AS (
            SELECT doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS start_tok
            FROM mixed
        )
        SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS docs_in,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM dedup) AS docs_after_dedup,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM quality) AS docs_after_quality,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM mixed) AS docs_after_mix,
            (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM mixed) AS total_tokens,
            (SELECT CAST(MAX((start_tok + n_tokens - 1) // {PACK_CAPACITY}) + 1
                         AS BIGINT) FROM pref) AS n_sequences
    """,
    tags=("packing", "llm-pipeline", "pipeline"),
    doc="The END-TO-END training-data pipeline as one DAG: exact dedup "
    "(min doc_id per md5 text hash — one hash-agg) -> quality gates "
    "(token count and mean word length, row-local) -> deterministic "
    "60% mixture sample (pmod, pushdown-friendly) -> GPT-style "
    f"{PACK_CAPACITY}-token sequence packing over the distributed "
    "prefix sum. Every stage is shuffle-bounded (one hash-agg, one "
    "range shuffle) and the whole flow is recomputed independently by "
    "the oracle — the composition proof that the primitives chain.",
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.expr(TOKENS).cast("long").alias("n_tokens")
    )
    # Stage membership as PER-ROW FLAGS over one deduping pass, so all
    # four funnel counts and the mixed token total come out of a single
    # aggregation job — the earlier per-stage .count() chain re-executed
    # the dedup shuffle once per stage (5 actions for 5 numbers).
    #
    # r16 shape (guide §2.3): the r8 ROW_NUMBER window shuffled one FULL
    # text row per document with no map-side reduction; grouping by the
    # md5 fingerprint with MIN(struct(doc_id, ...)) keeps the identical
    # min-doc_id-per-hash survivor (doc_id is unique, so the struct
    # comparison never reaches the tie fields) while (a) projecting the
    # shuffle down to (fp, doc_id, source, n_tokens, n_chars) — the
    # text column stays in the scan stage — and (b) partially
    # aggregating map-side. The frame is then localCheckpoint'd: the
    # funnel aggregate, the prefix-sum totals pass and the final
    # packing aggregate each re-evaluated the whole dedup pipeline
    # before (4 corpus passes; now exactly 1).
    per_fp = (
        base.select(
            F.md5("text").alias("fp"),
            F.length("text").alias("n_chars"),
            "doc_id",
            "source",
            "n_tokens",
        )
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(F.struct("doc_id", "source", "n_tokens", "n_chars")).alias("keep"),
        )
        .select(
            "n_copies",
            F.col("keep.doc_id").alias("doc_id"),
            F.col("keep.source").alias("source"),
            F.col("keep.n_tokens").alias("n_tokens"),
            F.col("keep.n_chars").alias("n_chars"),
        )
    )
    quality = F.expr(
        "n_tokens BETWEEN 20 AND 1000 "
        "AND (n_chars - n_tokens + 1.0) / n_tokens < 12"
    )
    flagged = per_fp.select(
        "doc_id",
        "n_tokens",
        "n_copies",
        quality.alias("is_quality"),
        (
            quality
            & F.col("source").isin(*[f"src{i}" for i in range(10)])
            & (F.pmod("doc_id", F.lit(1000)) < 600)
        ).alias("is_mixed"),
    ).localCheckpoint()
    funnel = flagged.agg(
        # coalesce (ADVICE r16): COUNT(*)-era behavior on an empty
        # documents table was 0; SUM over zero rows is NULL
        F.coalesce(F.sum("n_copies"), F.lit(0)).alias("docs_in"),
        F.count("*").alias("docs_after_dedup"),
        F.count_if("is_quality").alias("docs_after_quality"),
        F.count_if("is_mixed").alias("docs_after_mix"),
        F.sum(F.when(F.col("is_mixed"), F.col("n_tokens"))).alias("total_tokens"),
    ).first()
    packed = prefix_sum(
        flagged.filter("is_mixed").select("doc_id", "n_tokens"),
        "doc_id",
        "n_tokens",
        "start_tok",
        # input is a narrow filter of the checkpointed `flagged` frame:
        # re-evaluating it per phase reads local blocks, so a second
        # eager materialization costs more than it saves (ADVICE r16)
        materialize=False,
    )
    n_sequences = packed.agg(
        (
            F.max(
                F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / PACK_CAPACITY)
            )
            + 1
        ).alias("n_sequences")
    ).first().n_sequences
    return local_df(
        spark,
        [
            (
                funnel.docs_in,
                funnel.docs_after_dedup,
                funnel.docs_after_quality,
                funnel.docs_after_mix,
                funnel.total_tokens,
                n_sequences,
            )
        ],
        "docs_in bigint, docs_after_dedup bigint, docs_after_quality bigint, "
        "docs_after_mix bigint, total_tokens bigint, n_sequences bigint",
    )
