"""One-pass table profiling (ANALYZE-style column statistics).

A data lake at 10^12 rows needs column statistics before anything else
touches the data: null rates gate schema contracts, distinct counts size
dictionaries and join strategies, min/max bounds drive partition pruning
and zone maps (the same footer stats the chunk catalog's DML probe
prunes with, sources/sink.py). This operator computes all of them in ONE
aggregation job over the table and returns them long-format, one row per
profiled column.

Scale notes: with exact=True the plan uses Spark's multi-distinct Expand
(each input row is replicated once per profiled column inside the map
stage) — exact and fully partition-parallel, but the pre-aggregation
input grows by the number of profiled columns; at the 100-TB tier use
exact=False, which swaps count(DISTINCT) for HLL-based
approx_count_distinct: a single non-expanded pass whose shuffle carries
one partial sketch + (min, max, null-count) triple per partition, at
~rsd relative error on the distinct counts. Everything else (row count,
null counts, min/max) is a plain partial aggregate in both modes.

min/max are returned as the native type CAST TO STRING after
aggregating (a profile row must hold every column's bounds in one
schema). Integer / string / date / timestamp renderings are portable;
float columns are legal but their string form is engine-specific —
keep them out of cross-engine comparisons.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile `cols` (default: every column) of `df` in one aggregation.

    Returns (col_name, n_rows, n_nulls, n_distinct, min_value,
    max_value); n_distinct excludes NULLs (count-distinct semantics),
    n_rows counts them. `exact=False` switches distinct counting to
    approx_count_distinct(rsd) — the single-pass 100-TB tier."""
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    if not cols:
        raise ValueError("profile_table: no columns to profile")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        q = F.col(c)
        aggs.append(
            F.coalesce(F.sum(q.isNull().cast("long")), F.lit(0).cast("long")).alias(
                f"__nulls_{c}"
            )
        )
        nd = F.countDistinct(q) if exact else F.approx_count_distinct(q, rsd)
        aggs.append(nd.cast("long").alias(f"__nd_{c}"))
        aggs.append(F.min(q).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(q).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    entries = F.array(
        *(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        )
    )
    return one.select(F.explode(entries).alias("p")).select("p.*")
