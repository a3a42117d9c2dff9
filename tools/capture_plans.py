"""Capture `.explain("formatted")` for bench queries into plans/<tag>/.

The optimization rounds commit these so plan-shape claims in
OPTIMIZATION_r*.md are checkable without running Spark:

  python tools/capture_plans.py --tag r16 --suffix before [--only q1,q2]

writes plans/<tag>/<query>_<suffix>.txt for every HEADLINE + EXTRA
bench query (or the --only subset). Lifecycle entries whose cost is
commit IO rather than plan shape still get their final-frame plan —
the narrative for those lives in job/ledger counts, not exchanges.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-root", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans"))
    args = ap.parse_args()

    import bench
    from local_datalakehouse_phase2_spark.registry import all_specs
    from local_datalakehouse_phase2_spark.session import get_spark

    spark = get_spark(app_name=f"capture_plans_{args.tag}")
    specs = all_specs()
    names = [n for n in bench.HEADLINE + bench.EXTRA if n in specs]
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]

    out_dir = os.path.join(args.out_root, args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, args.sf_dir)
        # _explainString is what .explain() prints; grab it as a value.
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
