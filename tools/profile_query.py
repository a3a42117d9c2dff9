"""Runtime profile of one bench query: wall, Spark job count, and the
EXECUTED (AQE-final) plan with reused-stage evidence.

Per spark_optimization_guide.md §1: time with the noop sink so the
measurement covers every column of every row, label the job, and read
the final plan (explain() before execution hides AQE's stage reuse and
join rewrites). Job count comes from DAGScheduler.nextJobId (compared
as ints — the py4j `==` on the AtomicInteger object is reference
equality, see ADVICE r15).

Usage:
  python tools/profile_query.py minhash_lsh_pairs simhash_pairs [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3, help="timed runs after 1 warmup")
    ap.add_argument("--final-plan", action="store_true", help="print the AQE-final executed plan")
    ap.add_argument("--noop", action="store_true", help="materialize via noop sink instead of count()")
    args = ap.parse_args()

    from local_datalakehouse_phase2_spark.registry import all_specs
    from local_datalakehouse_phase2_spark.session import get_spark

    spark = get_spark(app_name="profile_query")
    sc = spark.sparkContext
    specs = all_specs()

    def job_id() -> int:
        v = sc._jsc.sc().dagScheduler().nextJobId()
        # py4j may auto-unbox the AtomicInteger's toString as int on some
        # versions; handle both shapes
        return v if isinstance(v, int) else v.get()

    def run(name: str):
        df = specs[name].fn(spark, args.sf_dir)
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return df

    for name in args.entries:
        sc.setJobDescription(f"profile:{name}")
        run(name)  # warm
        walls = []
        jobs_before = job_id()
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = run(name)
            walls.append(time.perf_counter() - t0)
        jobs = (job_id() - jobs_before) / args.runs
        walls_s = " ".join(f"{w:.3f}" for w in sorted(walls))
        print(f"{name}: median {sorted(walls)[len(walls)//2]:.3f}s  walls [{walls_s}]  jobs/run {jobs:.1f}", flush=True)
        if args.final_plan:
            # executedPlan after an action reflects AQE's final stages
            print(df._jdf.queryExecution().executedPlan().toString())
        sc.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
