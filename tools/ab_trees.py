"""Process-interleaved cross-TREE A/B harness (r15, VERDICT item 2).

Runs the same registry entries in TWO checkouts (e.g. HEAD vs a prior
round's worktree), alternating whole processes A,B,A,B,... so neighbor
load on this shared box hits both trees symmetrically — the only
cross-round timing methodology that means anything here (see
BENCH_quiet notes / memory: single runs vary 2-3x under invisible host
contention). Within each process the entries run `--runs` warm passes
in one session; the per-process statistic is the median of the warm
passes (pass 0 is discarded as cold unless --keep-cold). The reported
per-tree number is the median across that tree's processes.

Usage:
  python tools/ab_trees.py --tree-b /path/to/old/worktree \
      [--tree-a .] [--names n1,n2] [--rounds 3] [--runs 3] \
      [--sf-dir /root/testdata/sf0.1] [--out AB_r15.json]

Writes the artifact JSON (loadavg before/after, every raw pass, the
medians and B/A ratios) to --out and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from local_datalakehouse_phase2_spark.registry import all_specs
from local_datalakehouse_phase2_spark.session import get_spark

names, sf_dir, runs = sys.argv[1].split(","), sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name="ab_trees")
specs = all_specs()
# Warm read + write paths once (bench.py's protocol): the first write
# job in a JVM pays ~5s of committer/codegen setup that must not land
# on pass 0 of whichever lifecycle entry runs first.
import shutil, tempfile
from local_datalakehouse_phase2_spark.lakehouse.catalog import Lakehouse
specs[names[0]].fn(spark, sf_dir).count()
wd = tempfile.mkdtemp(prefix="ab_warm_")
try:
    lake = Lakehouse(spark, wd)
    lake.create_namespace("warm")
    wt = lake.create_table("warm.t")
    wt.append(spark.range(10).selectExpr("id AS event_id", "CAST(id AS STRING) AS user_id"))
finally:
    shutil.rmtree(wd, ignore_errors=True)
times = {n: [] for n in names}
for r in range(runs):
    for n in names:
        t0 = time.monotonic()
        specs[n].fn(spark, sf_dir).count()
        times[n].append(round(time.monotonic() - t0, 3))
print("ABJSON " + json.dumps(times), flush=True)
"""


def _loadavg() -> str:
    return open("/proc/loadavg").read().split()[0]


def _run_tree(tree: str, names: list[str], sf_dir: str, runs: int) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", _RUNNER, ",".join(names), sf_dir, str(runs)],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABJSON "):
            return json.loads(line[len("ABJSON "):])
    raise RuntimeError(
        f"tree {tree}: no ABJSON line\nstdout tail: {p.stdout[-2000:]}\n"
        f"stderr tail: {p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--names", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--keep-cold", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    names = args.names.split(",")

    t_start = time.time()
    load_before = _loadavg()
    raw: dict[str, list[dict]] = {"a": [], "b": []}
    for m in range(args.rounds):
        for key, tree in (("a", args.tree_a), ("b", args.tree_b)):
            res = _run_tree(tree, names, args.sf_dir, args.runs)
            raw[key].append(res)
            warm = {
                n: round(statistics.median(v if args.keep_cold else v[1:] or v), 3)
                for n, v in res.items()
            }
            print(f"round {m} tree {key} ({tree}): {warm}", flush=True)
    load_after = _loadavg()

    def tree_median(key: str, n: str) -> float:
        per_proc = [
            statistics.median(res[n][1:] if not args.keep_cold and len(res[n]) > 1 else res[n])
            for res in raw[key]
        ]
        return round(statistics.median(per_proc), 3)

    per_query = {}
    for n in names:
        a, b = tree_median("a", n), tree_median("b", n)
        per_query[n] = {"a": a, "b": b, "a_over_b": round(a / b, 3) if b else None}
    out = {
        "methodology": (
            f"process-interleaved cross-tree A/B: {args.rounds} rounds of "
            f"(A,B), each process {args.runs} in-session passes, cold pass "
            "discarded, median of per-process warm medians"
        ),
        "tree_a": args.tree_a,
        "tree_b": args.tree_b,
        "sf_dir": args.sf_dir,
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "wall_sec": round(time.time() - t_start, 1),
        "per_query": per_query,
        "raw_passes": raw,
    }
    blob = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob + "\n")
    print(blob)


if __name__ == "__main__":
    main()
