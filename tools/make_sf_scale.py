"""Deterministic k-times upsample of a testdata dir -> a larger scale
factor for scale rehearsals (round-5 verdict item: run the headline
set and the oracle gate at ~sf1 without touching the read-only driver
data).

Construction: every table is replicated k times with PRIMARY and
FOREIGN keys shifted consistently per replica (offset = replica *
(max_key + 1) from the SOURCE table), so join cardinalities scale
linearly — a replica's lineitem rows join ONLY its own orders/customer
replicas, never fan out across replicas. Dimension tables (region,
nation) and dimension foreign keys (nationkey) are copied unshifted,
exactly how a real 10x corpus shares its dimensions.

Correctness at the new scale is still oracle-checkable: every oracle
is a pure function of the tables' values (modular doc_id rules,
algorithm replays), so `tools/check_oracles.py <scaled_dir>` runs the
full gate against DuckDB on the SAME scaled parquet.

Usage: python tools/make_sf_scale.py [src_dir] [dst_dir] [k]
       defaults: /root/testdata/sf0.1 /tmp/horus_sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> list of (column, key_space) to shift; key_space names the
# table whose max key defines the offset stride (FK alignment)
SHIFTS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "customer")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "events": [("event_id", "events"), ("user_id", "events_user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
    "nation": [],
    "region": [],
}

KEY_OF = {
    "customer": ("customer", "c_custkey"),
    "orders": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supplier": ("supplier", "s_suppkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def scale_dir(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = {
        space: con.sql(
            f"SELECT max({col}) + 1 FROM '{src}/{tbl}.parquet'"
        ).fetchone()[0]
        for space, (tbl, col) in KEY_OF.items()
    }
    for table, shifts in SHIFTS.items():
        src_p = f"{src}/{table}.parquet"
        dst_p = f"{dst}/{table}.parquet"
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{src_p}'").fetchall()
        ]
        if not shifts:  # dimension: verbatim copy
            con.sql(f"COPY (SELECT * FROM '{src_p}') TO '{dst_p}'")
            continue
        shifted = dict(shifts)
        proj = ", ".join(
            f"{c} + r.r * {strides[shifted[c]]} AS {c}" if c in shifted else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {proj} FROM '{src_p}', range({k}) r(r)) "
            f"TO '{dst_p}'"
        )
    for table in SHIFTS:
        n_src = con.sql(
            f"SELECT count(*) FROM '{src}/{table}.parquet'"
        ).fetchone()[0]
        n_dst = con.sql(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'"
        ).fetchone()[0]
        want = n_src if table in ("nation", "region") else n_src * k
        assert n_dst == want, (table, n_src, n_dst)
        print(f"{table}: {n_src} -> {n_dst}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/horus_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_dir(src, dst, k)
