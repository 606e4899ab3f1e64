"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, column names, and order-insensitive values (doubles at 1e-9 rel).

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(str)
        else:
            df[c] = pd.to_numeric(df[c], errors="coerce").astype(float)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"columns differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: {len(a)} vs {len(b)}"
    a, b = norm_frame(a), norm_frame(b)
    for c in a.columns:
        if a[c].dtype == float:
            bad = ~np.isclose(a[c], b[c], rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            bad = a[c].to_numpy() != b[c].to_numpy()
        if bad.any():
            i = int(np.flatnonzero(bad)[0])
            return f"value diff col={c} row={i}: {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from horus_spark.session import get_spark

    spark = get_spark(master="local[8]", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            n_fail += 1
            continue
        diff = compare(sdf, odf)
        if diff:
            print(f"FAIL {name}: {diff} (spark {len(sdf)} rows / duckdb {len(odf)} rows)")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(sdf)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
