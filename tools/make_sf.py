"""Generate larger scale-factor fixtures by replicating sf0.1.

The driver ships read-only fixtures up to sf0.1 (`TESTDATA.md`); the
scale-ladder bench (VERDICT r9 task #2) needs sf1 to measure whether
any plan goes super-linear at 10x data. True dbgen output has a
different schema (more columns, DATE not TIMESTAMP), so instead we
scale the driver's own tables: FACTOR key-shifted copies, with every
foreign key shifted by the SAME per-table offset so join fan-out,
per-key cardinality, and selectivity profiles are preserved — copy i
is a parallel universe of copy 0, and only the number of keys grows.

Two deliberate de-duplications keep the text/vector workloads from
becoming pathological 10-cliques of exact duplicates (which would
measure the LSH bucket cap, not natural scaling):
- documents: copies 1..N-1 get a per-(copy, doc) seeded word shuffle —
  token/char statistics are preserved, shingle sets are not, so
  near-dup density stays roughly natural instead of x10.
- embeddings: copies get small seeded gaussian noise (sigma=0.05),
  keeping the label-cluster geometry while breaking exact ties.

region/nation are dimension universes (5/25 rows joined by value) and
are copied verbatim.

Usage: python tools/make_sf.py [--factor 10] [--out /tmp/spark_graft_sf1]
       [--src /root/testdata/sf0.1] [--tables documents,embeddings]
`--src` chains rungs (sf1 -> sf10 at another 10x without re-shuffling
5M rows from the 50k base); `--tables` restricts to a subset — the
sf10 dedup/ANN rung only needs documents+embeddings (r14). Documents
stream copy-by-copy through one ParquetWriter so a 100x corpus never
materializes as Python dicts.
Deterministic: same inputs + factor => byte-identical logical content.
"""

from __future__ import annotations

import argparse
import os
import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _offset(con, path: str, col: str) -> int:
    return con.sql(f"SELECT max({col}) + 1 FROM read_parquet('{path}')").fetchone()[0]


def scale_relational(con, out: str, factor: int) -> None:
    cu = _offset(con, f"{SRC}/customer.parquet", "c_custkey")
    su = _offset(con, f"{SRC}/supplier.parquet", "s_suppkey")
    pa_ = _offset(con, f"{SRC}/part.parquet", "p_partkey")
    orr = _offset(con, f"{SRC}/orders.parquet", "o_orderkey")
    ev = _offset(con, f"{SRC}/events.parquet", "event_id")
    us = _offset(con, f"{SRC}/events.parquet", "user_id")

    copies = f"(SELECT unnest(range({factor})) AS i) copies"

    jobs = {
        # every FK shifted by the same offset as its referenced PK:
        # copy i joins only within copy i, so plans scale in keys only.
        "customer": f"""
            SELECT CAST(c_custkey + i*{cu} AS BIGINT) AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet'), {copies}
        """,
        "supplier": f"""
            SELECT CAST(s_suppkey + i*{su} AS BIGINT) AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM read_parquet('{SRC}/supplier.parquet'), {copies}
        """,
        "part": f"""
            SELECT CAST(p_partkey + i*{pa_} AS BIGINT) AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM read_parquet('{SRC}/part.parquet'), {copies}
        """,
        "orders": f"""
            SELECT CAST(o_orderkey + i*{orr} AS BIGINT) AS o_orderkey,
                   CAST(o_custkey + i*{cu} AS BIGINT) AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet'), {copies}
        """,
        "lineitem": f"""
            SELECT CAST(l_orderkey + i*{orr} AS BIGINT) AS l_orderkey,
                   CAST(l_partkey + i*{pa_} AS BIGINT) AS l_partkey,
                   CAST(l_suppkey + i*{su} AS BIGINT) AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet'), {copies}
        """,
        "events": f"""
            SELECT CAST(event_id + i*{ev} AS BIGINT) AS event_id, ts,
                   CAST(user_id + i*{us} AS BIGINT) AS user_id,
                   event_type, value, props
            FROM read_parquet('{SRC}/events.parquet'), {copies}
        """,
    }
    for name, sql in jobs.items():
        con.sql(
            f"COPY ({sql} ORDER BY 1) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {name}: written")

    for dim in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{dim}.parquet')) "
            f"TO '{out}/{dim}.parquet' (FORMAT PARQUET)"
        )


def scale_documents(out: str, factor: int) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    base = t.to_pylist()
    doc_off = max(r["doc_id"] for r in base) + 1
    writer = pq.ParquetWriter(f"{out}/documents.parquet", t.schema)
    for i in range(factor):
        rows = []
        for r in base:
            text = r["text"]
            if i > 0:
                words = text.split()
                random.Random(i * 1_000_003 + r["doc_id"]).shuffle(words)
                text = " ".join(words)
            rows.append(
                {
                    "doc_id": r["doc_id"] + i * doc_off,
                    "text": text,
                    "lang": r["lang"],
                    "source": r["source"],
                    "n_chars": len(text),
                }
            )
        writer.write_table(pa.Table.from_pylist(rows, schema=t.schema))
    writer.close()


def scale_embeddings(out: str, factor: int) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    embs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    off = int(vec_ids.max()) + 1
    out_ids, out_labels, out_embs = [], [], []
    for i in range(factor):
        rng = np.random.default_rng(42_000 + i)
        e = embs if i == 0 else (embs + rng.normal(0, 0.05, embs.shape)).astype(np.float32)
        out_ids.append(vec_ids + i * off)
        out_labels.append(labels)
        out_embs.append(e)
    table = pa.Table.from_arrays(
        [
            pa.array(np.concatenate(out_ids), type=t.schema.field("vec_id").type),
            pa.array(list(np.concatenate(out_embs)), type=t.schema.field("embedding").type),
            pa.array(np.concatenate(out_labels), type=t.schema.field("label").type),
        ],
        names=["vec_id", "embedding", "label"],
    )
    pq.write_table(table, f"{out}/embeddings.parquet")


def main() -> None:
    global SRC
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--tables", default="all", help="comma list or 'all'")
    args = ap.parse_args()
    SRC = args.src
    tables = None if args.tables == "all" else set(args.tables.split(","))
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    if tables is None:
        scale_relational(con, args.out, args.factor)
    if tables is None or "documents" in tables:
        scale_documents(args.out, args.factor)
    if tables is None or "embeddings" in tables:
        scale_embeddings(args.out, args.factor)
    for f in sorted(os.listdir(args.out)):
        p = os.path.join(args.out, f)
        n = con.sql(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0]
        print(f"{f}: {n} rows, {os.path.getsize(p)>>20} MiB")


if __name__ == "__main__":
    main()
