"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented the scale-correct way: tag both sides, UNION, then one
window pass per key carrying the latest right-side row forward
(`last(..., ignorenulls=True)` over rows up to current). That is ONE
shuffle on the key for both inputs combined — no join, no per-key
explosion for heavy keys, state bounded by one row per partition
frame. The naive alternative (theta-join on `r.ts <= l.ts` + rank)
shuffles both sides AND materializes every (left, right-candidate)
pair before the rank cut — quadratic in per-key event count, which is
exactly what kills it at 100 TB.

Tie semantics: right-side rows sort BEFORE left-side rows at equal
timestamps (side marker 0 < 1), so a right row at exactly t matches a
left row at t ("backward" as-of, inclusive) — same as DuckDB/pandas
`ASOF JOIN` / `merge_asof` defaults; among equal-timestamp right rows
the largest event_id wins (total order => deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    order: str,
    right_cols: tuple[str, ...],
    tiebreak: str,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the most recent
    right row with right.order <= left.order within the same `on` key.

    Returns all left columns plus `right_cols` (each prefixed `r_`);
    left rows with no prior right row are dropped (inner as-of).
    `tiebreak` orders equal-timestamp right rows (larger wins).
    """
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    # a NULL order value can never satisfy right.order <= left.order —
    # but ascending sort puts NULLs FIRST, so an unfiltered NULL row
    # would be carried forward as a bogus "earliest" match
    r = right.filter(F.col(order).isNotNull()).select(
        F.col(on), F.col(order), F.lit(0).alias("__side"), F.col(tiebreak).alias("__tb"), payload
    )
    payload_type = r.schema["__r"].dataType.simpleString()
    # left's own columns ride along through the union (null on the right
    # side), so no second join is needed to recover them afterwards
    l_full = left.select(
        F.col(on),
        F.col(order),
        F.lit(1).alias("__side"),
        # tiebreak only orders right-side rows among themselves; the side
        # marker already places every left row after same-timestamp right
        # rows, so the left tiebreak is a typed null
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        F.lit(None).cast(payload_type).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    r_full = r.select(
        "*", *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns]
    )
    w = (
        W.partitionBy(on)
        .orderBy(F.col(order), F.col("__side"), F.col("__tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        r_full.unionByName(l_full)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter((F.col("__side") == 1) & F.col("__match").isNotNull())
    )
    out_left = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__match.{c}").alias(f"r_{c}") for c in right_cols]
    return carried.select(*out_left, *out_right)


@register(
    "asof_click_attribution",
    oracle="""
        -- CAST(ts AS TIMESTAMP) truncates TIMESTAMP_NS to the same
        -- microsecond precision Spark's loader produces, so ordering,
        -- the <= cut, and the lag arithmetic agree across engines.
        WITH clicks AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        ),
        ranked AS (
            SELECT p.event_id AS purchase_id, p.user_id,
                   p.ts AS purchase_ts, p.value,
                   c.event_id AS click_id, c.ts AS click_ts,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY c.ts DESC, c.event_id DESC) AS rk
            FROM purchases p
            JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
        )
        SELECT purchase_id, user_id, purchase_ts, value, click_id, click_ts,
               CAST(date_diff('microsecond', click_ts, purchase_ts) AS BIGINT) AS lag_us
        FROM ranked
        WHERE rk = 1
        ORDER BY purchase_id
    """,
    tags=("asof", "join", "window"),
    doc="As-of join (click -> purchase attribution): each purchase matched to "
    "the user's most recent click at-or-before it. Union + keyed window pass — "
    "one shuffle, no theta-join explosion; the oracle's rank-over-theta-join "
    "formulation is the semantic spec, not the plan.",
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        order="ts",
        right_cols=("event_id", "ts"),
        tiebreak="event_id",
    )
    return (
        joined.select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "value",
            F.col("r_event_id").alias("click_id"),
            F.col("r_ts").alias("click_ts"),
            F.expr("timestampdiff(MICROSECOND, r_ts, ts)").cast("bigint").alias("lag_us"),
        )
        .orderBy("purchase_id")
    )
