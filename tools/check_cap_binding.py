"""sf10 cap-binding agreement check (r16, VERDICT r15 item 3).

At sf0.01/sf0.1/sf1 `shingles_over_cap` is 0 (BENCH_ladder.json), so
the CC_BUCKET_CAP rule is inert and engine/oracle agreement there
proves nothing about the cap. At sf10 the corpus crosses the cap
(4,696 over-cap shingles), so capped and uncapped Jaccard genuinely
diverge — this tool converts the recall ARGUMENT into counted
EVIDENCE at the rung where the rule binds:

1. DuckDB derives its own capped edge set (the dedup_clusters oracle's
   edge CTEs) and an uncapped variant (cap -> 1e9).
2. `removed_by_cap = uncapped - capped` must be NON-EMPTY (otherwise
   the check is vacuous and exits 1).
3. The ENGINE's `capped_banded_edges` must agree with the cap where it
   binds: zero engine edges inside `removed_by_cap`.
4. The full engine-vs-oracle capped edge symmetric difference is
   counted and reported (band-miss probability predicts ~2.2e-5 per
   true edge at J=0.6; fixture dupes at J>=0.9 predict ~0).

Prints one JSON line; paste the result into SCALE_CORRECTNESS.md.

Usage: python tools/check_cap_binding.py [--sf-dir /tmp/spark_graft_sf10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf10")
    args = ap.parse_args()

    import duckdb

    from local_datalakehouse_phase2_spark.operators import dedup
    from local_datalakehouse_phase2_spark.registry import all_specs
    from local_datalakehouse_phase2_spark.session import get_spark
    from local_datalakehouse_phase2_spark.sources.loaders import parallel_scan

    sql = all_specs()["dedup_clusters"].oracle
    # keep everything up to (and including) the edges CTE, then project
    # the edges themselves instead of running the recursion
    edge_q = sql[: sql.index("-- MATERIALIZED")].rstrip().rstrip(",") + (
        " SELECT a, b FROM edges"
    )
    uncapped_q = edge_q.replace(
        f"COUNT(*) <= {dedup.CC_BUCKET_CAP}", "COUNT(*) <= 1000000000"
    )
    assert uncapped_q != edge_q, "cap literal not found in oracle SQL"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{args.sf_dir}/documents.parquet')"
    )
    t0 = time.time()
    over_cap = con.execute(
        f"""
        WITH sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(range(1, len(w) - 1),
                          i -> array_to_string(w[i:i+2], ' '))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= 3
        )
        SELECT COUNT(*) FROM (
            SELECT s FROM sh GROUP BY s HAVING COUNT(*) > {dedup.CC_BUCKET_CAP}
        )
        """
    ).fetchone()[0]
    print(f"over_cap_shingles={over_cap} ({time.time()-t0:.0f}s)", flush=True)
    if over_cap == 0:
        print(json.dumps({"error": "cap is inert at this sf — check is vacuous"}))
        return 1

    t0 = time.time()
    capped = {tuple(r) for r in con.execute(edge_q).fetchall()}
    print(f"duck_capped_edges={len(capped)} ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    uncapped = {tuple(r) for r in con.execute(uncapped_q).fetchall()}
    print(f"duck_uncapped_edges={len(uncapped)} ({time.time()-t0:.0f}s)", flush=True)
    removed_by_cap = uncapped - capped
    added_by_cap = capped - uncapped  # cap can ADD edges: smaller union
    print(
        f"removed_by_cap={len(removed_by_cap)} added_by_cap={len(added_by_cap)}",
        flush=True,
    )

    spark = get_spark(app_name="cap-binding", shuffle_partitions=32)
    t0 = time.time()
    d = parallel_scan(spark, args.sf_dir, "documents")
    engine = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.capped_banded_edges(d).select("doc_a", "doc_b").collect()
    }
    print(f"engine_capped_edges={len(engine)} ({time.time()-t0:.0f}s)", flush=True)

    engine_kept_capped_removals = sorted(engine & removed_by_cap)[:20]
    sym_diff = engine.symmetric_difference(capped)
    out = {
        "sf_dir": args.sf_dir,
        "over_cap_shingles": int(over_cap),
        "duck_capped_edges": len(capped),
        "duck_uncapped_edges": len(uncapped),
        "removed_by_cap": len(removed_by_cap),
        "added_by_cap": len(added_by_cap),
        "engine_capped_edges": len(engine),
        "engine_edges_violating_cap": len(engine & removed_by_cap),
        "engine_vs_oracle_sym_diff": len(sym_diff),
        "sym_diff_sample": sorted(sym_diff)[:10],
        "violating_sample": engine_kept_capped_removals,
    }
    print(json.dumps(out), flush=True)
    ok = out["engine_edges_violating_cap"] == 0 and out["removed_by_cap"] > 0
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
