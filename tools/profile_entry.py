"""Profile one registry entry end-to-end (r16, VERDICT item 6).

Splits a lifecycle entry's wall time into the layers that matter for
the ~2.4 s floors (`lakehouse_catalog_branch`,
`lakehouse_multi_table_txn`): py4j round-trips (Spark job wait +
driver-JVM chatter), metadata IO (lakehouse.fs), log folds, and pure
Python. cProfile over the whole call; prints top functions by
cumulative time, grouped by module family.

Usage: python tools/profile_entry.py lakehouse_multi_table_txn [--sf-dir ...] [--warm N]
"""

from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entry")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", type=int, default=1, help="warmup runs before the profiled one")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from local_datalakehouse_phase2_spark.registry import all_specs
    from local_datalakehouse_phase2_spark.session import get_spark

    spec = all_specs()[args.entry]
    spark = get_spark(app_name="profile-entry", shuffle_partitions=32)

    for i in range(args.warm):
        t0 = time.time()
        spec.fn(spark, args.sf_dir).collect()
        print(f"warm{i}: {time.time()-t0:.2f}s", flush=True)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    spec.fn(spark, args.sf_dir).collect()
    prof.disable()
    wall = time.time() - t0
    print(f"profiled: {wall:.2f}s", flush=True)

    st = pstats.Stats(prof)
    st.sort_stats("cumulative")

    # family buckets by filename
    fam_tot: dict[str, float] = {}
    for (fn, _ln, name), (cc, nc, tt, ct, callers) in st.stats.items():
        key = None
        if "py4j" in fn and ("recv" in name or "readline" in name):
            key = "py4j-socket-wait"  # JVM work the driver blocks on
        elif "/lakehouse/fs.py" in fn:
            key = "metadata-io(fs.py)"
        elif "/lakehouse/log.py" in fn:
            key = "log-folds(log.py)"
        if key:
            fam_tot[key] = fam_tot.get(key, 0.0) + tt  # tottime: no double count
    print("\n--- family tottime (exclusive) ---")
    for k, v in sorted(fam_tot.items(), key=lambda kv: -kv[1]):
        print(f"{k:24s} {v:7.3f}s  ({100*v/wall:4.1f}% of wall)")

    print("\n--- top by cumulative ---")
    st.print_stats(args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
