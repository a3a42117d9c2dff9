"""Funnel step-ordering discrimination (VERDICT r7 #6).

At sf0.01 the fixture funnel is degenerate — every user completes
every step in order (150/150/150/150, rate 1.0), so the oracle never
discriminates the chained `t2 > t1` conditional-min logic. This test
feeds the REAL registry callable a synthetic events table with
out-of-order users and asserts the funnel excludes them, in both the
PySpark implementation and an independent DuckDB recomputation. It
fails if any `ts > t_prev` condition is dropped (users B and C would
then be counted)."""

from __future__ import annotations

import duckdb

# synthetic users:
#  A: view@1  click@2  purchase@3  -> full funnel, in order
#  B: click@1 view@2               -> click BEFORE view: step 2 must exclude
#  C: purchase@1 view@2 click@3    -> purchase before click: step 3 must exclude
#  D: view@1                       -> viewed only
#  E: click@1 purchase@2           -> never viewed: excluded everywhere
_EVENTS = [
    ("A", "view", 1), ("A", "click", 2), ("A", "purchase", 3),
    ("B", "click", 1), ("B", "view", 2),
    ("C", "purchase", 1), ("C", "view", 2), ("C", "click", 3),
    ("D", "view", 1),
    ("E", "click", 1), ("E", "purchase", 2),
]
# total=5, viewed=4 (not E), clicked-after-view=2 (A, C), purchased-after=1 (A)
_EXPECTED = (5, 4, 2, 1, 0.25)


def test_funnel_excludes_out_of_order_users(spark, tmp_path):
    from pyspark.sql import functions as F

    from local_datalakehouse_phase2_spark.streaming.event_windows import (
        funnel_conversion,
    )

    rows = [(u, e, f"2024-01-01 0{h}:00:00") for u, e, h in _EVENTS]
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, raw string"
    ).select("user_id", "event_type", F.to_timestamp("raw").alias("ts"))
    ev.write.parquet(str(tmp_path / "events.parquet"))

    got = funnel_conversion(spark, str(tmp_path)).collect()[0]
    assert (
        got.users_total,
        got.users_viewed,
        got.users_clicked_after,
        got.users_purchased_after,
        float(got.view_to_purchase_rate),
    ) == _EXPECTED


def test_funnel_ordering_duckdb_recomputation(tmp_path):
    """Same semantics recomputed independently in DuckDB over the same
    rows — pins the EXPECTED constants themselves against a second
    engine rather than trusting the hand calculation."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev(user_id VARCHAR, event_type VARCHAR, ts BIGINT)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", _EVENTS)
    got = con.execute(
        """
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM ev
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM ev e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM ev e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT COUNT(*), COUNT(t1), COUNT(t2), COUNT(t3),
               ROUND(COUNT(t3) * 1.0 / COUNT(t1), 6)
        FROM (SELECT DISTINCT user_id FROM ev) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
        """
    ).fetchone()
    assert (got[0], got[1], got[2], got[3], float(got[4])) == _EXPECTED
