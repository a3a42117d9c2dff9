"""Table sources: load the driver's parquet fixtures as DataFrames.

Maps the reference's scan operators (SURVEY.md S1 table scan, S7
parquet binding — /root/reference/SPARK_ICEBERG_GUIDE.md:129,137) onto
`spark.read.parquet`. Paths stay abstract (any filesystem URI Spark
supports) so the same loader works against `file://`, `s3a://`, etc.;
only configuration changes at cluster scale (SURVEY.md S8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan => Catalyst gets predicate
    pushdown, column pruning, and row-group skipping for free.

    `events.ts` has shipped as either parquet TIMESTAMP(MICROS) or
    TIMESTAMP(NANOS, isAdjustedToUTC=false) across fixture
    generations, so the conversion is schema-adaptive: a LongType read
    (nanos-as-long, session config
    `spark.sql.legacy.parquet.nanosAsLong`) is divided down to micros;
    a native timestamp read is just cast. Either way the column lands
    as TIMESTAMP_NTZ to match the naive-timestamp semantics of the
    other fixture tables and of DuckDB.
    """
    if name == "events":
        # The conf is runtime-settable, so set it here rather than relying
        # on session-build config: any foreign SparkSession (driver
        # harness, notebook) that didn't go through session.py can still
        # read a NANOS column. Harmless for MICROS files.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql.types import LongType

        # BOTH conversion branches strip a zone using the SESSION
        # timezone (timestamp_micros produces an instant; casting any
        # TIMESTAMP to NTZ localizes it), so a foreign SparkSession not
        # pinned to UTC would shift every value by its tz offset. Pin
        # it here (runtime-settable, idempotent) rather than trusting
        # session.py ran.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # integer `div`, NOT `/`: float division of epoch-nanos
            # (~1.7e18) exceeds double's 53-bit mantissa and lands
            # ±hundreds of ns off.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def parallel_scan(
    spark: SparkSession, sf_dir: str, name: str, min_partitions: int | None = None
) -> DataFrame:
    """load_table + fan-out for CPU-bound downstream stages.

    A single-file, single-row-group parquet source arrives as ONE input
    split, which serializes every expensive per-row stage (Arrow UDFs,
    shingle hashing, wide regex projections) onto one core no matter how
    many the cluster has. A round-robin repartition to defaultParallelism
    costs one shuffle of the raw rows — tiny relative to the compute it
    unblocks — and restores full fan-out. At warehouse scale the source
    already has >= cores splits and this is a no-op, so the shape is
    scale-safe in both directions.
    """
    df = load_table(spark, sf_dir, name)
    n = min_partitions or spark.sparkContext.defaultParallelism
    # len(df.inputFiles()) is a metadata-only lower bound on the number of
    # input splits — it avoids the RDD conversion / plan compilation that
    # df.rdd.getNumPartitions() forces just to count partitions.
    if len(df.inputFiles()) < n:
        df = df.repartition(n)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view so both the
    DataFrame API and spark.sql can see the same relations."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
