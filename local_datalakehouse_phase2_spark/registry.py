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
    from .streaming import event_windows  # noqa: F401

    _LOADED = True
