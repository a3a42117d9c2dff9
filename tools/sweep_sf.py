"""Run the full registry-vs-DuckDB oracle sweep at ANY scale factor.

The driver's correctness gate fixes sf0.01; this tool re-runs the
same differential (order-insensitive string value hash, the driver's
method) against any fixture directory — in round 10 it caught the
prefix_sum cross-job corruption at sf1 that the gate could not see
(SCALE_CORRECTNESS.md). Oracles are interrupted after --oracle-timeout
seconds (some gate-scale SQL oracles are quadratic); queries whose
oracle is a pinned VALUES literal are reported as `pinned-skip` at
non-gate scale factors, since a mismatch there is definitional.

Hash mismatches auto-classify: `float-boundary` when every differing
cell is a float within 1 ULP at its rendered ROUND precision (the
order-dependent double-summation signature, e.g. q9_product_profit /
hourly_rollup_hypertable at sf1 — SCALE_CORRECTNESS.md), else
`REAL-MISMATCH`. REAL-MISMATCH always fails the sweep; float-boundary
fails too AT THE GATE sf unless the query is explicitly allowlisted
(GATE_FLOAT_BOUNDARY_ALLOWLIST) — off-gate it is reported, not fatal.

Usage:
  python tools/sweep_sf.py [--sf-dir /tmp/spark_graft_sf1]
                           [--oracle-timeout 120] [--include-pinned]
Exit code 1 if any non-pinned oracle REAL-mismatches or errors.
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

# At the GATE scale factor a float-boundary classification does NOT get a
# free pass: a genuine bug perturbing only float columns within ~1.5 units
# at rendered ROUND precision would otherwise auto-pass the correctness
# gate. Queries with a KNOWN order-dependent-summation boundary at the gate
# sf must be listed here explicitly (none today — the known trio
# q9/hourly_rollup/pivot_returnflag only flips at sf1); anything else
# classifying float-boundary at the gate counts as a failure.
GATE_FLOAT_BOUNDARY_ALLOWLIST: set[str] = set()


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


def _cell_close(vs: str, vd: str) -> bool:
    """Two stringified float cells within 1 ULP at their rendered
    decimal precision — the signature of order-dependent double
    summation hitting a ROUND boundary (Spark's partial-aggregation
    order vs DuckDB's sequential scan), e.g. '123.45' vs '123.46'
    under ROUND(x, 2)."""
    if vs == vd:
        return True
    try:
        fs, fd = float(vs), float(vd)
    except (TypeError, ValueError):
        return False
    if fs == fd:
        return True

    def decimals(s: str) -> int | None:
        if "e" in s.lower() or "." not in s:
            return None
        return len(s.split(".", 1)[1])

    ds, dd = decimals(vs), decimals(vd)
    if ds is None or dd is None:
        # no fixed-point rendering: bare double noise, relative 1e-9
        return abs(fs - fd) <= 1e-9 * max(abs(fs), abs(fd))
    return abs(fs - fd) <= 1.5 * 10.0 ** -max(ds, dd)


def classify_mismatch(spd, dpd) -> str:
    """After a string-hash mismatch: 'float-boundary' when every
    differing cell is a float within 1 ULP at the ROUND precision,
    else 'real'. Rows align by sorting on the non-float columns (then
    the whole row), so boundary-flipped float orderings don't
    misalign; any alignment failure reports 'real' — the conservative
    direction (false REAL alarms possible, false float-boundary not)."""
    import pandas.api.types as ptypes

    cols = sorted(spd.columns)
    if len(spd) != len(dpd) or cols != sorted(dpd.columns):
        return "real"
    sa, db = spd[cols], dpd[cols]
    is_float = [
        bool(ptypes.is_float_dtype(sa[c]) or ptypes.is_float_dtype(db[c]))
        for c in cols
    ]
    if not any(is_float):
        return "real"

    def rows(df):
        return [tuple(map(str, r)) for r in df.itertuples(index=False)]

    def key(r):
        return (tuple(v for v, f in zip(r, is_float) if not f), r)

    for rs, rd in zip(sorted(rows(sa), key=key), sorted(rows(db), key=key)):
        for vs, vd, f in zip(rs, rd, is_float):
            if vs != vd and not (f and _cell_close(vs, vd)):
                return "real"
    return "float-boundary"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--oracle-timeout", type=float, default=120.0)
    ap.add_argument("--include-pinned", action="store_true")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: sweep just these (targeted re-check)",
    )
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
    if args.only:
        only = {n.strip() for n in args.only.split(",") if n.strip()}
        missing = only - set(qs)
        if missing:
            print(f"unknown query names: {sorted(missing)}", flush=True)
            return 1
        qs = {n: qs[n] for n in only}
    bad, timed_out, pinned_skipped, float_boundary = [], [], [], []
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
            if classify_mismatch(spd, dpd) == "float-boundary":
                if at_gate and name not in GATE_FLOAT_BOUNDARY_ALLOWLIST:
                    # gate sf: float-boundary is only tolerated via the
                    # explicit allowlist — otherwise it fails the sweep
                    bad.append(name)
                float_boundary.append(name)
                print(
                    f"float-boundary {name} spark={len(spd)} duck={len(dpd)} "
                    f"(order-dependent double summation at ROUND precision; "
                    f"{time.time()-t0:.1f}s)",
                    flush=True,
                )
            else:
                bad.append(name)
                print(
                    f"REAL-MISMATCH {name} spark={len(spd)} duck={len(dpd)} "
                    f"({time.time()-t0:.1f}s)",
                    flush=True,
                )
        else:
            print(f"ok {name} ({time.time()-t0:.1f}s)", flush=True)

    print(
        f"SWEEP DONE sf_dir={args.sf_dir} bad={bad} "
        f"oracle_timeout={timed_out} pinned_skipped={len(pinned_skipped)} "
        f"float_boundary={float_boundary}",
        flush=True,
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
