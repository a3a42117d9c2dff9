"""Deterministic sampling operators for dataset mixing.

Training-data pipelines mix sources at controlled rates ("50% en,
10% each other language") and must be REPRODUCIBLE: re-running the
pipeline, retrying a task, or adding an executor cannot change which
rows are in the mix. `df.sample()`/`sampleBy()` are seeded per
partition-split and reshuffle under retries/AQE re-plans, so the
deterministic form keys the decision on the ROW ITSELF:

    keep iff  pmod(key, 1000) < rate * 1000

Pure row-local arithmetic: no shuffle, no state, embarrassingly
parallel, pushdown-friendly (the predicate reaches the scan), and the
sample is a stable FUNCTION of the data — the properties that matter
when the corpus is 100 TB and the sample must be auditable. With a
synthetic uniform key (here doc_id; in production xxhash64 of a stable
id) realized rates concentrate at the target by Chernoff bounds.

The mixing spec (rate per stratum) rides a broadcast join, so quotas
scale to millions of strata without a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..localrows import local_df
from ..registry import register
from ..sources.loaders import load_table


def deterministic_sample(
    df: DataFrame, key, rate: float, denominator: int = 1000
) -> DataFrame:
    """Keep rows where pmod(key, denom) < rate*denom — reproducible,
    shuffle-free, retry-stable."""
    # round, not int(): float representation error floors e.g.
    # 0.29 * 100 = 28.999999999999996 into a 28% sample
    return df.filter(F.pmod(key, F.lit(denominator)) < round(rate * denominator))


def stratified_mix(
    df: DataFrame, stratum_col: str, key, rates: dict[str, float], denominator: int = 1000
) -> DataFrame:
    """Per-stratum deterministic rates via a broadcast spec join;
    strata absent from `rates` are dropped (rate 0)."""
    spark = df.sparkSession
    spec = local_df(
        spark,
        [(s, round(r * denominator)) for s, r in rates.items()],
        f"{stratum_col} string, __keep_below int",
    )
    return (
        df.join(F.broadcast(spec), stratum_col)
        .filter(F.pmod(key, F.lit(denominator)) < F.col("__keep_below"))
        .drop("__keep_below")
    )


@register(
    "stratified_sample_mix",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents
        WHERE (lang = 'en' AND doc_id % 1000 < 500)
           OR (lang IN ('de', 'fr') AND doc_id % 1000 < 100)
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("sampling", "pipeline", "deterministic"),
    doc="Reproducible dataset mix: 50% of en, 10% of de/fr, 0% of the "
    "rest, decided by pmod(doc_id, 1000) — row-local arithmetic, so the "
    "mix is a stable function of the data (retry/AQE/seed-proof), the "
    "predicate pushes to the scan, and per-stratum rates ride a broadcast "
    "spec join (no driver loop; scales to millions of strata). The oracle "
    "is the identical arithmetic in SQL — exact, not statistical.",
)
def stratified_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mixed = stratified_mix(
        docs,
        "lang",
        F.col("doc_id"),
        {"en": 0.5, "de": 0.1, "fr": 0.1},
    )
    return (
        mixed.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("lang")
    )
