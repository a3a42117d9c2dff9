"""sf10 cap-binding agreement check (r16, VERDICT r15 item 3).

At sf0.01/sf0.1/sf1 `shingles_over_cap` is 0 (BENCH_ladder.json), so
the CC_BUCKET_CAP rule is inert and engine/oracle agreement there
proves nothing about the cap. At sf10 the corpus crosses it (4,696
over-cap shingles, each shared by 1,001-1,136 docs) — this tool turns
the recall ARGUMENT into counted EVIDENCE at the rung where the rule
binds.

Why the removed-set derivation is sound WITHOUT uncapped banding
(which is structurally infeasible — the over-cap buckets hold 2.45e9
pair slots at sf10; that pathology is the reason the cap exists):

- An edge "removed by the cap" passes the UNCAPPED rule
  (inter >= J*(na+nb-inter)) but fails the CAPPED one (same formula,
  intersection counted over under-cap shingles only; union from FULL
  sizes both times). Capping only shrinks the intersection, and only
  by the shared over-cap shingles — at sf10 a doc carries ~9.6 of
  them on average — so every removed edge retains capped similarity
  close to the threshold: its capped-Jaccard Jc satisfies
  inter_c >= inter_u - shared_overcap, giving Jc well above ~0.4 for
  this corpus' shingle counts.
- A pair at capped-Jaccard Jc collides in the capped 24x2 bands with
  probability 1-(1-Jc^2)^24 (>= 0.98 at Jc = 0.4, >= 0.9997 at 0.5),
  so the CAPPED candidate set contains the removed edges up to that
  band-miss bound — which this tool REPORTS from the minimum Jc it
  actually observes, instead of assuming it.
- Therefore: enumerate the capped band candidates (cheap — corpus-
  sparse by construction), score each under BOTH rules, and the pairs
  that pass uncapped but fail capped ARE the removed set (up to the
  stated miss bound). Monotonicity also forces added_by_cap = 0
  (capped-pass implies uncapped-pass); asserted.

Checks:
1. over-cap shingles > 0 (non-vacuity; exit 1 otherwise).
2. removed_by_cap > 0 (the cap genuinely binds; exit 1 otherwise).
3. The ENGINE's capped_banded_edges emits NONE of the removed pairs
   and matches DuckDB's capped edge set exactly (sym diff reported).

Prints one JSON line; record it in SCALE_CORRECTNESS.md.

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
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument(
        "--cap",
        type=int,
        default=None,
        help="override CC_BUCKET_CAP (smoke-testing the derivation at an sf "
        "where the real cap is inert; engine compare is skipped since the "
        "engine runs the real cap)",
    )
    ap.add_argument("--skip-engine", action="store_true")
    args = ap.parse_args()

    import duckdb

    from local_datalakehouse_phase2_spark.operators import dedup
    from local_datalakehouse_phase2_spark.session import get_spark
    from local_datalakehouse_phase2_spark.sources.loaders import parallel_scan

    cap, jthr = args.cap or dedup.CC_BUCKET_CAP, dedup.CC_JACCARD
    if args.cap is not None:
        args.skip_engine = True
    con = duckdb.connect()
    con.execute(f"SET threads={args.threads}")
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
            SELECT s FROM sh GROUP BY s HAVING COUNT(*) > {cap}
        )
        """
    ).fetchone()[0]
    print(f"over_cap_shingles={over_cap} ({time.time()-t0:.0f}s)", flush=True)
    if over_cap == 0:
        print(json.dumps({"error": "cap is inert at this sf — check is vacuous"}))
        return 1

    # One pass over the CAPPED band candidates scoring BOTH rules:
    # capped lists (ch) and full lists (fh) ride the same per-doc CTE.
    t0 = time.time()
    both = con.execute(
        f"""
        WITH sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(range(1, len(w) - 1),
                          i -> array_to_string(w[i:i+2], ' '))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= 3
        ),
        freq AS (SELECT s, COUNT(*) AS n FROM sh GROUP BY s),
        clists AS MATERIALIZED (
            SELECT sh.doc_id,
                   list(sh.s) FILTER (WHERE f.n <= {cap}) AS cs,
                   list(hash(sh.s)) FILTER (WHERE f.n <= {cap}) AS ch,
                   list(hash(sh.s)) AS fh,
                   COUNT(*) AS n
            FROM sh JOIN freq f ON f.s = sh.s
            GROUP BY sh.doc_id
        ),
        bands AS (
            SELECT doc_id, r.i AS band,
                   list_min(list_transform(cs, x -> hash(x, 2 * r.i))) AS h0,
                   list_min(list_transform(cs, x -> hash(x, 2 * r.i + 1))) AS h1
            FROM clists, range(24) r(i)
            WHERE len(cs) > 0
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.h0 = y.h0 AND x.h1 = y.h1
             AND x.doc_id < y.doc_id
        ),
        scored AS MATERIALIZED (
            SELECT c.a, c.b,
                   len(list_intersect(la.ch, lb.ch)) AS inter_c,
                   len(list_intersect(la.fh, lb.fh)) AS inter_u,
                   la.n AS na, lb.n AS nb
            FROM cand c
            JOIN clists la ON la.doc_id = c.a
            JOIN clists lb ON lb.doc_id = c.b
        )
        SELECT a, b,
               inter_c >= {jthr} * (na + nb - inter_c) AS pass_c,
               inter_u >= {jthr} * (na + nb - inter_u) AS pass_u,
               CAST(inter_c AS DOUBLE) / (na + nb - inter_c) AS jc
        FROM scored
        WHERE (inter_c >= {jthr} * (na + nb - inter_c))
           OR (inter_u >= {jthr} * (na + nb - inter_u))
        """
    ).fetchall()
    print(f"scored_edge_candidates={len(both)} ({time.time()-t0:.0f}s)", flush=True)

    capped_edges = {(a, b) for a, b, pc, pu, jc in both if pc}
    removed = {(a, b) for a, b, pc, pu, jc in both if pu and not pc}
    added = {(a, b) for a, b, pc, pu, jc in both if pc and not pu}
    removed_jc = [jc for a, b, pc, pu, jc in both if pu and not pc]
    min_jc = min(removed_jc) if removed_jc else None
    miss_bound = (1 - min_jc**2) ** 24 if min_jc is not None else None
    print(
        f"duck_capped_edges={len(capped_edges)} removed_by_cap={len(removed)} "
        f"added_by_cap={len(added)} min_removed_jc={min_jc} "
        f"residual_band_miss_bound={miss_bound}",
        flush=True,
    )

    if args.skip_engine:
        engine = set(capped_edges)
    else:
        spark = get_spark(app_name="cap-binding", shuffle_partitions=32)
        t0 = time.time()
        d = parallel_scan(spark, args.sf_dir, "documents")
        engine = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.capped_banded_edges(d).select("doc_a", "doc_b").collect()
        }
        print(f"engine_capped_edges={len(engine)} ({time.time()-t0:.0f}s)", flush=True)

    sym_diff = engine.symmetric_difference(capped_edges)
    out = {
        "sf_dir": args.sf_dir,
        "cap": cap,
        "over_cap_shingles": int(over_cap),
        "duck_capped_edges": len(capped_edges),
        "removed_by_cap": len(removed),
        "added_by_cap": len(added),
        "min_removed_capped_jaccard": min_jc,
        "residual_band_miss_bound": miss_bound,
        "engine_capped_edges": len(engine),
        "engine_edges_violating_cap": len(engine & removed),
        "engine_vs_oracle_sym_diff": len(sym_diff),
        "sym_diff_sample": sorted(sym_diff)[:10],
        "violating_sample": sorted(engine & removed)[:10],
    }
    print(json.dumps(out), flush=True)
    ok = (
        out["removed_by_cap"] > 0
        and out["added_by_cap"] == 0
        and out["engine_edges_violating_cap"] == 0
    )
    if not args.skip_engine:
        spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
