"""Two-writer incremental-dedup race at ANY scale (r16, VERDICT item 7).

Replicates tests/test_r13_races.py::test_concurrent_incremental_dedup_
equals_serial — two real Lakehouse writers racing one persisted
band-key index, barrier-forced into the pathological both-read-before-
either-commits interleaving — at an arbitrary fixture dir, and prints
the counted terms of the concurrent-writer path:

  index_rows          persisted band keys before the race
  batch_rows_{a,b}    each racer's band keys
  serial_pairs        the serial schedule's pair set size
  race_pairs          |union of the racers' outputs|
  cross_pairs         pairs spanning the two batches (the race's bite)
  equal               race union == serial set (the correctness claim)

Usage: python tools/race_incremental.py [--sf-dir /tmp/spark_graft_sf1]
Exit 1 when the race output diverges from serial or the fixture has no
cross-batch dupes (vacuous run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IDX_SCHEMA = "doc_id bigint, band int, bh bigint"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from local_datalakehouse_phase2_spark.lakehouse import Lakehouse
    from local_datalakehouse_phase2_spark.operators.dedup import (
        band_keys,
        dedup_incremental,
    )
    from local_datalakehouse_phase2_spark.session import get_spark
    from local_datalakehouse_phase2_spark.sources.loaders import parallel_scan

    spark = get_spark(app_name="race-incremental", shuffle_partitions=32)
    work = args.workdir or tempfile.mkdtemp(prefix="race_incr_")

    docs = parallel_scan(spark, args.sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    batch_a = docs.filter(F.col("doc_id") % 3 == 1)
    batch_b = docs.filter(F.col("doc_id") % 3 == 2)

    def pairs(df):
        return {(r.doc_a, r.doc_b) for r in df.collect()}

    t0 = time.time()
    lake_s = Lakehouse(spark, os.path.join(work, "serial"))
    lake_s.create_namespace("lab")
    idx_s = lake_s.create_table("lab.bands", schema=IDX_SCHEMA)
    idx_s.append(band_keys(base))
    index_rows = idx_s.read().count()
    serial = pairs(dedup_incremental(batch_a, idx_s, docs)) | pairs(
        dedup_incremental(batch_b, idx_s, docs)
    )
    t_serial = time.time() - t0

    t0 = time.time()
    race_wh = os.path.join(work, "race")
    lake_setup = Lakehouse(spark, race_wh)
    lake_setup.create_namespace("lab")
    lake_setup.create_table("lab.bands", schema=IDX_SCHEMA).append(band_keys(base))

    barrier = threading.Barrier(2, timeout=600)
    results: dict[str, set] = {}
    errors: list[BaseException] = []

    def writer(name, batch):
        try:
            idx = Lakehouse(spark, race_wh).table("lab.bands")
            orig = idx.merge

            def stalled_merge(self, *a, **kw):
                barrier.wait()
                return orig(*a, **kw)

            idx.merge = types.MethodType(stalled_merge, idx)
            results[name] = pairs(dedup_incremental(batch, idx, docs))
        except BaseException as e:
            errors.append(e)

    ta = threading.Thread(target=writer, args=("a", batch_a))
    tb = threading.Thread(target=writer, args=("b", batch_b))
    ta.start(), tb.start()
    ta.join(1200), tb.join(1200)
    t_race = time.time() - t0
    if errors:
        print("ERRORS:", errors)
        return 1

    race_union = results["a"] | results["b"]
    a_ids = {r.doc_id for r in batch_a.select("doc_id").collect()}
    b_ids = {r.doc_id for r in batch_b.select("doc_id").collect()}
    cross = {
        (x, y)
        for (x, y) in serial
        if (x in a_ids and y in b_ids) or (x in b_ids and y in a_ids)
    }
    out = {
        "sf_dir": args.sf_dir,
        "index_rows": index_rows,
        "batch_rows_a": band_keys(batch_a).count(),
        "batch_rows_b": band_keys(batch_b).count(),
        "serial_pairs": len(serial),
        "race_pairs": len(race_union),
        "cross_pairs": len(cross),
        "cross_recovered": len(cross & race_union),
        "equal": race_union == serial,
        "t_serial_s": round(t_serial, 1),
        "t_race_s": round(t_race, 1),
    }
    print(json.dumps(out), flush=True)
    ok = out["equal"] and out["cross_pairs"] > 0 and out["cross_recovered"] == out["cross_pairs"]
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
