"""Plan gates pinning the r16 optimization-round wins structurally.

- The fused COMBO entries (simhash_pairs / simhash_wide_pairs) run the
  corpus pipeline (scan -> shingle -> signature UDFs -> band explode ->
  bucket shuffle) exactly ONCE at runtime: the annotation id branch is
  a WHEN-projection over the same `buckets` frame, so AQE stage reuse
  serves it from the one bucket exchange. Before r16 the ids derived
  from the post-shuffle pair frame and each annotation probe re-planned
  the whole pipeline (two+ live bucket ShuffleQueryStages, one
  ArrowEvalPython pass each). A `filter(fam == 0)` instead of the WHEN
  would silently reintroduce that: the predicate pushes below the
  aggregate (fam is a grouping key) and the exchanges stop
  canonicalizing equal.
- lang_id_ngram picks the per-doc argmax with an aggregate, never a
  per-doc ROW_NUMBER window (the Sort + extra Exchange the r16 rewrite
  removed).
- q21 ships per-order aggregates, not raw-row semi/anti joins (shape
  also pinned in test_plans.py::test_tpch_extended2_plan_shapes).
"""

from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.plans.inspect import plan_string
from local_datalakehouse_phase2_spark.registry import all_specs

SPECS = all_specs()


def _final_plan(df) -> str:
    """AQE-final executed plan only (toString appends the initial plan,
    which still shows the pre-reuse copies)."""
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def test_fused_combo_pipeline_runs_once(spark, sf_small):
    for name in ("simhash_pairs", "simhash_wide_pairs"):
        plan = _final_plan(SPECS[name].fn(spark, sf_small))
        n_udf = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
        assert n_udf == 1, f"{name}: {n_udf} live Python-UDF passes\n{plan}"
        assert "ReusedExchange" in plan, f"{name}: ids branch did not reuse\n{plan}"


def test_lang_id_has_no_per_doc_window(spark, sf_small):
    import re

    plan = plan_string(SPECS["lang_id_ngram"].fn(spark, sf_small))
    tree = plan.split("\n\n")[0]  # operator tree; details repeat names
    windows = re.findall(r"\bWindow \(\d+\)", tree)
    # exactly one Window remains: the top-50-per-lang profile cut
    assert len(windows) == 1, tree


@pytest.mark.slow
def test_fused_combo_pipeline_runs_once_sf1(spark):
    """VERDICT r16 item 8: the fused single-pass win hangs on AQE
    exchange canonicalization (the WHEN-projection-vs-filter trap), and
    sf_small cannot prove it where it costs something — run the same
    executed-plan gate at the sf1 rung. Marked slow (builder-gate /
    ladder runs); skipped when the generated sf1 fixture is absent
    (tools/make_sf.py --factor 10)."""
    import os

    sf1 = "/tmp/spark_graft_sf1"
    if not os.path.isdir(sf1):
        pytest.skip("sf1 fixture not generated (tools/make_sf.py)")
    for name in ("simhash_pairs", "simhash_wide_pairs"):
        plan = _final_plan(SPECS[name].fn(spark, sf1))
        n_udf = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
        assert n_udf == 1, f"{name}@sf1: {n_udf} live Python-UDF passes\n{plan}"
        assert "ReusedExchange" in plan, f"{name}@sf1: ids branch did not reuse\n{plan}"
