#!/usr/bin/env python
"""Deterministic scale-factor upsampler: sfN = K consistent copies of
the driver's sf0.1 testdata (seed-free — every transform is a pure
function of (copy index, row), so the output is bit-reproducible).

The driver's generator isn't available above sf0.1, and /root/testdata
is read-only, so scale evidence beyond sf0.1 derives the corpus from
the committed tables themselves:

* region/nation (fixed dims): copied verbatim.
* customer/supplier/part/orders/lineitem/events: K copies with
  consistent key offsets (offset = copy * (max_key+1) per key family),
  so referential integrity, per-key row counts, value distributions
  and temporal density-per-bucket scale exactly linearly.
* documents: copy 0 verbatim; copy c>0 rewrites every whitespace token
  t -> 'c<c>t'. The map is injective per token, so the IN-COPY
  duplicate/near-duplicate topology of the original corpus replicates
  exactly (equal texts stay equal, token-set Jaccard is preserved),
  while CROSS-COPY token sets are disjoint — no quadratic blow-up of
  near-dup pairs from the replication itself.
* embeddings: copy 0 verbatim; copy c>0 applies a per-copy signed
  permutation of the 64 dims (float32-exact: values only move and flip
  sign, no rounding), preserving all in-copy dot products up to fold
  order while making cross-copy cosines sub-threshold with
  overwhelming probability.

Output lands under /root/repo/.data/sf<N> (gitignored) as ONE parquet
file per table, matching the driver layout so SPARK_GRAFT_SF_DIR /
SF_DIR point straight at it. Spark still parallelizes the scans:
FilePartition sizing divides single files by defaultParallelism.
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# key families: (table, column) -> stride source (table, key col)
OFFSETS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
}
STRIDE_SRC = {"c_custkey": "customer", "o_orderkey": "orders",
              "p_partkey": "part", "s_suppkey": "supplier",
              "event_id": "events", "user_id": "events",
              "doc_id": "documents"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data", "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    k = args.copies
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(os.cpu_count() or 8, 16)}")

    strides = {}
    for key, tbl in STRIDE_SRC.items():
        strides[key] = con.execute(
            f"SELECT max({key}) + 1 FROM "
            f"'{args.src}/{tbl}.parquet'").fetchone()[0]

    def copy_sql(table: str, cols: list[str]) -> str:
        offs = OFFSETS.get(table, {})
        parts = []
        for c in cols:
            if c in offs:
                parts.append(f"{c} + t.c * {strides[offs[c]]} AS {c}")
            elif table == "documents" and c == "text":
                # injective per-token rewrite for c>0 (see module doc)
                parts.append(
                    "CASE WHEN t.c = 0 THEN text ELSE "
                    "regexp_replace(text, '(\\S+)', "
                    "'c' || t.c || '\\1', 'g') END AS text")
            elif table == "documents" and c == "n_chars":
                parts.append("0 AS n_chars")   # fixed up below
            else:
                parts.append(c)
        return (f"SELECT {', '.join(parts)} FROM "
                f"'{args.src}/{table}.parquet', range({k}) t(c)")

    for table in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents"]:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM "
            f"'{args.src}/{table}.parquet'").fetchall()]
        if table in ("region", "nation"):
            sql = f"SELECT * FROM '{args.src}/{table}.parquet'"
        else:
            sql = copy_sql(table, cols)
        if table == "documents":
            # n_chars tracks the rewritten text (the source invariant
            # n_chars == length(text) holds at every SF)
            sql = (f"SELECT doc_id, text, lang, source, "
                   f"length(text)::BIGINT AS n_chars FROM ({sql})")
        out = f"{args.dst}/{table}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")

    # embeddings: numpy signed-permutation copies, float32-exact
    src = pq.read_table(f"{args.src}/embeddings.parquet")
    vec_type = src.schema.field("embedding").type
    ids = src.column("vec_id").to_numpy()
    labels = src.column("label").to_numpy()
    X = np.stack(src.column("embedding").to_pandas().to_numpy())
    n, d = X.shape
    stride = int(ids.max()) + 1
    tabs = []
    for c in range(k):
        if c == 0:
            Xc = X
        else:
            rng = np.random.default_rng(7000 + c)
            perm = rng.permutation(d)
            signs = (rng.integers(0, 2, d) * 2 - 1).astype(X.dtype)
            Xc = X[:, perm] * signs[None, :]
        tabs.append(pa.table({
            "vec_id": pa.array(ids + c * stride, pa.int64()),
            "embedding": pa.array(list(Xc), vec_type),
            "label": pa.array(labels, pa.int32())}))
    emb = pa.concat_tables(tabs)
    pq.write_table(emb, f"{args.dst}/embeddings.parquet")
    print(f"embeddings: {emb.num_rows} rows (dim {d})")


if __name__ == "__main__":
    main()
