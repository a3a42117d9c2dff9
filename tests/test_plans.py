"""Plan-quality gates: the optimizations SURVEY.md §4 counts on must
actually appear in the physical plans — at 100 TB a missing pushdown
or a shuffled dim join is the difference between minutes and hours.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.plans.inspect import (
    has_partial_aggregation,
    has_take_ordered,
    join_strategies,
    plan_string,
    pushed_filters,
    scan_columns,
)
from local_datalakehouse_phase2_spark.registry import all_specs
from local_datalakehouse_phase2_spark.sources.loaders import load_table

SPECS = all_specs()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_small):
    df = SPECS["q6_revenue_change"].fn(spark, sf_small)
    pushed = pushed_filters(df)
    assert pushed and any(p for p in pushed), f"no pushed filters: {pushed}"
    assert any("l_quantity" in p or "l_discount" in p or "l_shipdate" in p for p in pushed)


def test_column_pruning_projects_only_needed_columns(spark, sf_small):
    # q1 touches 7 of lineitem's 16 columns; the scan must not read more
    df = SPECS["q1_pricing_summary"].fn(spark, sf_small)
    (cols,) = scan_columns(df)
    assert len(cols) <= 8, f"scan reads too many columns: {sorted(cols)}"
    assert "l_comment" not in cols and "l_orderkey" not in cols


def test_dim_joins_broadcast(spark, sf_small):
    for name in ("broadcast_dim_join", "q3_shipping_priority", "window_topk_per_group"):
        strategies = join_strategies(SPECS[name].fn(spark, sf_small))
        assert strategies, f"{name}: no join in plan"
        assert all(s == "BroadcastHashJoin" for s in strategies), f"{name}: {strategies}"


def test_no_cartesian_products_in_registry(spark, sf_small):
    """Nothing in the registry may plan a CartesianProduct; the only
    nested-loop join allowed is the brute-force scorer's deliberate
    broadcast cross join."""
    for name, spec in SPECS.items():
        if name.startswith("lakehouse"):
            continue  # lifecycle demos materialize eagerly; nothing to explain
        strategies = join_strategies(spec.fn(spark, sf_small))
        assert "CartesianProduct" not in strategies, f"{name}: {strategies}"
        if "BroadcastNestedLoopJoin" in strategies:
            # deliberate: brute-force scorer's broadcast cross join, the
            # non-equi range join against a rows-small banding side, and
            # the exact all-pairs cosine baseline (LSH is its scale path)
            assert name in (
                "cosine_topk_bruteforce",
                "range_band_join",
                # the ANN recall audits embed the brute-force truth set
                # on purpose (same plan as cosine_topk_bruteforce)
                "ann_lsh_recall",
                "ann_ivf_recall",
                "embedding_cosine_dupes",
                # PQ scores the corpus against a HANDFUL of broadcast
                # query LUTs — same deliberate broadcast cross join as
                # the brute-force scorer (and its recall audit embeds
                # the exact-cosine truth side)
                "pq_adc_topk",
                "pq_recall_vs_exact",
                # dense-calendar construction: (distinct series) x
                # (generated days) — both sides metadata-sized
                "gapfill_forward",
                # scalar-subquery comparisons against a ONE-ROW broadcast
                # side (avg balance / stock-value threshold) — NL over 1
                # row is a constant filter
                "q22_global_sales_opportunity",
                "q11_important_part_stock",
            ), f"{name}: unexpected NL join"


def test_partial_aggregation_before_shuffle(spark, sf_small):
    for name in ("q1_pricing_summary", "token_frequency", "group_agg_stats"):
        assert has_partial_aggregation(SPECS[name].fn(spark, sf_small)), name


def test_tpch_extended_dims_broadcast(spark, sf_small):
    """The multi-way TPC-H shapes must broadcast every dimension side:
    at most ONE shuffled join pair (the lineitem⋈orders fact-fact edge)
    may appear; every other join must be broadcast-hash."""
    for name in ("q7_volume_shipping", "q8_market_share", "q9_product_profit",
                 "q10_returned_items"):
        strategies = join_strategies(SPECS[name].fn(spark, sf_small))
        assert strategies, f"{name}: no join in plan"
        non_broadcast = [s for s in strategies if s not in ("BroadcastHashJoin",)]
        assert len(non_broadcast) <= 1, f"{name}: {strategies}"


def test_tpch_extended_topk_take_ordered(spark, sf_small):
    for name in ("q10_returned_items", "q18_large_volume_customer"):
        assert has_take_ordered(SPECS[name].fn(spark, sf_small)), name


def test_q4_exists_plans_semi_join(spark, sf_small):
    plan = plan_string(SPECS["q4_order_priority"].fn(spark, sf_small))
    assert "LeftSemi" in plan or "Semi" in plan, plan


def test_q22_not_exists_plans_anti_join(spark, sf_small):
    plan = plan_string(SPECS["q22_global_sales_opportunity"].fn(spark, sf_small))
    assert "LeftAnti" in plan or "Anti" in plan, plan


def test_tpch_extended2_plan_shapes(spark, sf_small):
    """q2/q16/q20/q21 must plan the join strategies their docstrings
    promise: broadcast dims everywhere, semi/anti where EXISTS/NOT
    IN/IN appear, TakeOrdered for the bounded outputs."""
    # q2: every join broadcast (the only shuffles are the two aggregates)
    q2 = SPECS["q2_min_cost_supplier"].fn(spark, sf_small)
    assert all(s == "BroadcastHashJoin" for s in join_strategies(q2)), join_strategies(q2)
    assert has_take_ordered(q2)
    # q16: NOT IN plans as an anti join; COUNT(DISTINCT) two-phase
    q16 = SPECS["q16_supplier_part_variety"].fn(spark, sf_small)
    p16 = plan_string(q16)
    assert "LeftAnti" in p16 or "Anti" in p16, p16
    assert has_partial_aggregation(q16)
    # q20: nested INs plan as semi joins
    p20 = plan_string(SPECS["q20_excess_supplier_promotion"].fn(spark, sf_small))
    assert "LeftSemi" in p20 or "Semi" in p20, p20
    # q21 (r16 shape): EXISTS/NOT EXISTS decorrelate into per-order
    # aggregates — the plan must carry map-side partial aggregation and
    # NO semi/anti join shuffling raw (orderkey, suppkey) rows
    q21 = SPECS["q21_waiting_suppliers"].fn(spark, sf_small)
    p21 = plan_string(q21)
    assert has_partial_aggregation(q21), p21
    assert "LeftSemi" not in p21 and "LeftAnti" not in p21, p21
    assert has_take_ordered(q21)
    # q12: map-side partial aggregation before the group-by shuffle
    assert has_partial_aggregation(SPECS["q12_priority_shipping"].fn(spark, sf_small))


def test_bucketed_join_has_zero_exchanges(spark, sf_small):
    """Both sides bucketed+sorted by the join key => the sort-merge join
    must plan with NO Exchange (the point of bucketing: the shuffle was
    paid once at write time). Broadcast is disabled for the check so the
    tiny sf_small tables can't sidestep the property being proven."""
    from local_datalakehouse_phase2_spark.operators.bucketing import (
        colocated_join,
        ensure_bucketed_tables,
    )

    li_tbl, o_tbl = ensure_bucketed_tables(spark, sf_small)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_string(colocated_join(spark, li_tbl, o_tbl))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_shuffle_hash_hint_plans_shj(spark, sf_small):
    strategies = join_strategies(SPECS["shuffle_hash_join_hint"].fn(spark, sf_small))
    assert "ShuffledHashJoin" in strategies, strategies


def test_partitioned_scan_prunes_directories(spark, sf_small):
    """A filter on the partition column must bind as PartitionFilters
    (planning-time directory pruning), not as a data filter."""
    from local_datalakehouse_phase2_spark.operators.partitioning import (
        ensure_partitioned_events,
        partition_pruned_scan,
    )

    part_dir = ensure_partitioned_events(spark, sf_small)
    plan = plan_string(partition_pruned_scan(spark, part_dir))
    assert "PartitionFilters" in plan, plan
    import re

    (pf,) = re.findall(r"PartitionFilters: \[(.*?)\]", plan)
    assert "event_type" in pf, plan


def test_topk_plans_take_ordered(spark, sf_small):
    assert has_take_ordered(SPECS["topk_orders"].fn(spark, sf_small))
    assert has_take_ordered(SPECS["token_frequency"].fn(spark, sf_small))


def test_metadata_scan_prunes_binary_payload(spark, sf_small):
    # the multimodal metadata query must not materialize the payload
    # bytes from the scan: only doc_id/text feed the synthesized cols
    df = SPECS["multimodal_metadata_scan"].fn(spark, sf_small)
    for cols in scan_columns(df):
        assert "payload" not in cols


def test_aqe_enabled_in_session(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_lineitem_filter_prunes_via_stats(spark, sf_small):
    """Row-group/file skipping needs min-max stats to survive into the
    scan: an always-false predicate must still be pushed (Catalyst may
    also fold it; either way no full-column filters remain)."""
    li = load_table(spark, sf_small, "lineitem").filter(F.col("l_quantity") < -1)
    p = plan_string(li)
    assert "PushedFilters" in p or "LocalTableScan" in p


def test_bucketed_agg_has_no_exchange(spark, sf_small):
    """Bucketing helps aggregations too: a groupBy on the bucket key
    over the bucketed table must plan without any Exchange."""
    from local_datalakehouse_phase2_spark.operators.bucketing import (
        ensure_bucketed_tables,
    )

    li_tbl, _ = ensure_bucketed_tables(spark, sf_small)
    agg = (
        spark.table(li_tbl)
        .groupBy("l_orderkey")
        .agg(F.sum("l_extendedprice").alias("total"))
    )
    plan = plan_string(agg)
    assert "Exchange" not in plan, plan


def test_approx_percentile_error_bound(spark, sf_small):
    """The sketch path must land within rank tolerance of the exact
    percentiles: with accuracy=1000 the rank error is ~1/1000, so on
    the fixture the estimate must sit between the exact p90 and p99
    for a p95 target (a loose but engine-independent band)."""
    rows = SPECS["approx_percentile_stats"].fn(spark, sf_small).collect()
    assert rows and all(r.p50_rank_ok and r.p95_rank_ok for r in rows), rows

    li = load_table(spark, sf_small, "lineitem")
    approx = {
        r.l_returnflag: (r.p50_est, r.p95_est)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("p50_est"),
            F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(1000)).alias("p95_est"),
        )
        .collect()
    }
    exact = {
        r.l_returnflag: (r.p40, r.p60, r.p90, r.p99)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.40)).alias("p40"),
            F.percentile("l_extendedprice", F.lit(0.60)).alias("p60"),
            F.percentile("l_extendedprice", F.lit(0.90)).alias("p90"),
            F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    for flag, (p50a, p95a) in approx.items():
        p40, p60, p90, p99 = exact[flag]
        assert p40 <= p50a <= p60, (flag, p50a, p40, p60)
        assert p90 <= p95a <= p99, (flag, p95a, p90, p99)
