"""Interleaved A/B harness for the dedup entries (round-14 clawback).

Runs each named variant N times interleaved in ONE session and prints
per-variant medians — the only timing methodology that means anything
on this shared host (see bench-noise notes). Variants are plain
callables (spark, sf_dir) -> DataFrame; timing materializes with a
count-collect like bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_datalakehouse_phase2_spark.registry import all_specs
from local_datalakehouse_phase2_spark.session import get_spark


def run_ab(variants, sf_dir=None, runs=3, warmup=True):
    """variants: list of (name, fn). Prints median seconds each."""
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    if warmup:
        # touch the corpus once so first-variant cold IO doesn't skew
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    times = {name: [] for name, _ in variants}
    for r in range(runs):
        for name, fn in variants:
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"  pass {r} {name}: {dt:.2f}s rows={n}", flush=True)
    print(json.dumps({
        "loadavg": open("/proc/loadavg").read().split()[0],
        "medians": {k: round(statistics.median(v), 3) for k, v in times.items()},
    }))
    return times


if __name__ == "__main__":
    specs = all_specs()
    names = sys.argv[1:] or ["minhash_lsh_pairs", "simhash_pairs", "simhash_wide_pairs"]
    run_ab([(n, specs[n].fn) for n in names])
