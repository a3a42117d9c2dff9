"""Plan gates pinning the r15 perf wins structurally (so a refactor
that silently reintroduces the regressions fails a TEST, not a bench):

- the fused want_est path runs the signature UDF in exactly ONE stage
  (the r14 +19% regression was a second UDF evaluation inside the
  annotation re-read);
- dedup_clusters' shingle doc-frequency join must never plan a
  BroadcastHashJoin on the counts side (|vocab|-scaled; AQE's
  undershot estimate OOM'd the sf10 rung);
- a repartition(n, cols) append of a LocalRelation takes the fastwrite
  multi-file path — zero Spark jobs on the write.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from local_datalakehouse_phase2_spark.operators import dedup
from local_datalakehouse_phase2_spark.plans.inspect import plan_string
from local_datalakehouse_phase2_spark.registry import all_specs
from local_datalakehouse_phase2_spark.sources.loaders import parallel_scan

SPECS = all_specs()


def test_fused_want_est_runs_udf_in_one_stage(spark, sf_small):
    """The minhash entry evaluates the signature UDF in exactly ONE
    runtime pass: est_jaccard forms in-bucket from carried sigs and the
    annotation id branch reuses the bucket exchange, so the r14
    regression's second signature-UDF evaluation cannot exist. (r15
    pinned this via the pairs localCheckpoint — 'zero UDF operators
    post-checkpoint'; r16 replaced the barrier with AQE stage reuse,
    so the pin moves to the executed final plan: one live
    ArrowEvalPython, ids branch served by a ReusedExchange.)"""
    df = SPECS["minhash_lsh_pairs"].fn(spark, sf_small)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    n_udf_ops = final.count("ArrowEvalPython") + final.count("BatchEvalPython")
    assert n_udf_ops == 1, f"{n_udf_ops} live Python-UDF passes:\n{final}"
    assert "ReusedExchange" in final, final


def test_clusters_counts_join_is_not_broadcast(spark, sf_small):
    """The doc-frequency `counts` side of capped_banded_edges' join is
    |vocab|-scaled and must plan as a shuffled hash join, never a
    broadcast (the hint pins it; this gate keeps the hint load-bearing)."""
    d = parallel_scan(spark, sf_small, "documents")
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(dedup._shingle_hashes())).alias("s")
    )
    counts = sh.groupBy("s").agg(F.count("*").alias("bucket"))
    joined = sh.join(counts.hint("shuffle_hash"), "s")
    plan = plan_string(joined, mode="simple")
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_repartitioned_local_append_runs_zero_jobs(spark, tmp_path):
    """The fastwrite multi-file path must not launch a Spark job: a
    job-counting listener sees nothing during the append."""
    from local_datalakehouse_phase2_spark.lakehouse import Lakehouse
    from local_datalakehouse_phase2_spark.localrows import local_df

    lake = Lakehouse(spark, str(tmp_path / "w"))
    lake.create_namespace("lab")
    t = lake.create_table("lab.n", schema="k bigint, v string")
    frame = local_df(
        spark, [(i, f"n{i}") for i in range(20)], "k bigint, v string"
    ).repartition(4, "k")
    sc = spark.sparkContext

    def _next_job_id() -> int:
        # py4j auto-converts the AtomicInteger on some Spark builds and
        # hands back the raw Java object on others; comparing the raw
        # object would be vacuous (same instance, reference equality)
        nid = sc._jsc.sc().dagScheduler().nextJobId()
        return nid.get() if hasattr(nid, "get") else int(nid)

    before = _next_job_id()
    sc.setJobGroup("zero-jobs-gate", "fastwrite append must not run jobs")
    try:
        t.append(frame)
    finally:
        sc.setJobGroup(None, None)
    after = _next_job_id()
    assert after == before, f"append launched {after - before} Spark job(s)"
    group_jobs = list(sc.statusTracker().getJobIdsForGroup("zero-jobs-gate"))
    assert group_jobs == [], f"append ran Spark jobs {group_jobs}"
    assert len(t.log.state_at()) == 4  # one file per non-empty partition
