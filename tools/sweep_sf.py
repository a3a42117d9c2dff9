"""Run the full registry-vs-DuckDB oracle sweep at ANY scale factor.

The driver's correctness gate fixes sf0.01; this tool re-runs the
same differential (order-insensitive string value hash, the driver's
method) against any fixture directory — in round 10 it caught the
prefix_sum cross-job corruption at sf1 that the gate could not see
(SCALE_CORRECTNESS.md). Oracles are interrupted after --oracle-timeout
seconds (some gate-scale SQL oracles are quadratic); queries whose
oracle is a pinned VALUES literal are reported as `pinned-skip` at
non-gate scale factors, since a mismatch there is definitional.

Usage:
  python tools/sweep_sf.py [--sf-dir /tmp/spark_graft_sf1]
                           [--oracle-timeout 120] [--include-pinned]
Exit code 1 if any non-pinned oracle mismatches or errors.
"""

from __future__ import annotations

import argparse
import hashlib
import importlib
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def vhash(df) -> str:
    df = df[sorted(df.columns)]
    return hashlib.md5(
        str(sorted(tuple(map(str, r)) for r in df.itertuples(index=False))).encode()
    ).hexdigest()


def is_pinned(sql: str) -> bool:
    """A literal-VALUES oracle references no table: valid only at the
    scale its literals were computed for."""
    head = sql.strip()[:200].upper()
    return head.startswith("SELECT * FROM (VALUES") or " FROM (VALUES" in head


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--oracle-timeout", type=float, default=120.0)
    ap.add_argument("--include-pinned", action="store_true")
    args = ap.parse_args()

    import duckdb
    import pandas as pd

    mod = importlib.import_module("__spark_entry__")
    from local_datalakehouse_phase2_spark.session import get_spark

    spark = get_spark(app_name="sweep-sf", shuffle_partitions=32)
    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    at_gate = args.sf_dir.rstrip("/") == GATE_DIR
    bad, timed_out, pinned_skipped = [], [], []
    for name in sorted(qs):
        t0 = time.time()
        sql = osql.get(name)
        try:
            spd = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:
            bad.append(name)
            print(f"ERROR {name} (spark) {type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        if sql is None:
            print(f"rows-only {name} {len(spd)} ({time.time()-t0:.1f}s)", flush=True)
            continue
        if is_pinned(sql) and not at_gate and not args.include_pinned:
            pinned_skipped.append(name)
            print(f"pinned-skip {name}", flush=True)
            continue
        timer = threading.Timer(args.oracle_timeout, con.interrupt)
        timer.start()
        try:
            dpd = con.execute(sql).df()
        except Exception:
            timed_out.append(name)
            print(f"ORACLE-TIMEOUT {name}", flush=True)
            continue
        finally:
            timer.cancel()
        for d in (spd, dpd):
            for c in d.columns:
                if pd.api.types.is_datetime64_any_dtype(d[c]):
                    d[c] = pd.to_datetime(d[c]).astype("datetime64[us]").astype(str)
        if vhash(spd) != vhash(dpd):
            bad.append(name)
            print(
                f"MISMATCH {name} spark={len(spd)} duck={len(dpd)} "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )
        else:
            print(f"ok {name} ({time.time()-t0:.1f}s)", flush=True)

    print(
        f"SWEEP DONE sf_dir={args.sf_dir} bad={bad} "
        f"oracle_timeout={timed_out} pinned_skipped={len(pinned_skipped)}",
        flush=True,
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
