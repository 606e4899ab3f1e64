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


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    null_delta_ppm: int = 10_000,
    distinct_lo_ppm: int = 500_000,
    distinct_hi_ppm: int = 2_000_000,
) -> DataFrame:
    """Schema/stats drift report between two profile_table outputs —
    the check a 10^12-row ingestion pipeline runs per batch: compare
    THIS snapshot's per-column profile against the previous one and
    flag what a schema registry alone cannot see (null-rate creep, a
    distinct-count collapse that signals an upstream join fanout or a
    constant-fill bug, range drift).

    Verdicts per column:
      added / dropped — present in only one profile;
      drift           — |null-rate delta| > null_delta_ppm, OR the
                        distinct ratio new/old (ppm) leaves
                        [distinct_lo_ppm, distinct_hi_ppm], OR the
                        min/max strings changed;
      stable          — none of the above.

    All comparisons are exact integer ppm (BIGINT products — profiles
    are column-counted, so nothing here can overflow); the inputs are
    one row per COLUMN, so this is a bounded full-outer join + map-side
    arithmetic — the profiles themselves were the corpus-scale pass.
    Returns (col_name, status, null_delta_ppm, distinct_ratio_ppm,
    range_changed); the ppm deltas are NULL for added/dropped columns
    (no counterpart to compare), range_changed is false there — a
    non-null boolean keeps downstream filters total."""
    if not 0 < distinct_lo_ppm <= distinct_hi_ppm:
        raise ValueError(
            "need 0 < distinct_lo_ppm <= distinct_hi_ppm, got "
            f"{distinct_lo_ppm}, {distinct_hi_ppm}"
        )

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            "col_name",
            F.expr("n_nulls * 1000000 div greatest(n_rows, 1)").alias(
                f"null_ppm_{tag}"
            ),
            F.col("n_distinct").alias(f"nd_{tag}"),
            F.col("min_value").alias(f"min_{tag}"),
            F.col("max_value").alias(f"max_{tag}"),
        )

    j = side(old, "o").join(side(new, "n"), "col_name", "full_outer")
    only_old = F.col("nd_n").isNull() & F.col("nd_o").isNotNull()
    only_new = F.col("nd_o").isNull() & F.col("nd_n").isNotNull()
    nd_delta = (F.col("null_ppm_n") - F.col("null_ppm_o")).cast("long")
    dist_ratio = F.expr(
        "CAST(nd_n * 1000000 div greatest(nd_o, 1) AS BIGINT)"
    )
    range_changed = ~(
        F.col("min_o").eqNullSafe(F.col("min_n"))
        & F.col("max_o").eqNullSafe(F.col("max_n"))
    )
    drifted = (
        (F.abs(nd_delta) > null_delta_ppm)
        | (dist_ratio < distinct_lo_ppm)
        | (dist_ratio > distinct_hi_ppm)
        | range_changed
    )
    return j.select(
        "col_name",
        F.when(only_old, F.lit("dropped"))
        .when(only_new, F.lit("added"))
        .when(drifted, F.lit("drift"))
        .otherwise(F.lit("stable"))
        .alias("status"),
        F.when(only_old | only_new, F.lit(None).cast("long"))
        .otherwise(nd_delta)
        .alias("null_delta_ppm"),
        F.when(only_old | only_new, F.lit(None).cast("long"))
        .otherwise(dist_ratio)
        .alias("distinct_ratio_ppm"),
        F.when(only_old | only_new, F.lit(False))
        .otherwise(range_changed)
        .alias("range_changed"),
    )


def pairwise_moments(
    df: DataFrame,
    cols: Sequence[str],
    scale: int = 100,
) -> DataFrame:
    """Exact pairwise co-moment table — the extended-ANALYZE statistic
    behind correlation/covariance reporting, computed so every engine
    agrees BIT-FOR-BIT: each column is snapped to integer units
    (value * scale, rounded — cents at the default 100) and the five
    co-moments accumulate as DECIMAL(38,0) integer sums, which are
    associative/commutative and therefore partitioning-independent —
    unlike float corr(), whose reduction order Spark does not fix.

    One row per unordered column pair (a < b by position):

      (col_a, col_b, n, sum_a, sum_b, sum_aa, sum_bb, sum_ab)

    over rows where BOTH columns are non-NULL (pairwise-complete
    semantics, the statistics convention). Pearson r or covariance
    derive downstream as (n*sum_ab - sum_a*sum_b) /
    sqrt((n*sum_aa - sum_a^2)(n*sum_bb - sum_b^2)) — the irrational
    step stays OUT of the engine-parity surface by design.

    Scale shape: ONE aggregation; each pair contributes six exact
    integer aggregates with map-side partial combine — no Expand, no
    per-pair passes, no shuffle beyond the single scalar-agg exchange.
    DECIMAL(38,0) holds |x| < 1e38: at cents scale that is ~1e15 rows
    of 1e9-valued columns before overflow — far past 100 TB."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    # element type decimal(18,0): products type out at 37 digits --
    # exact without touching Spark's precision-loss cap
    snapped = {
        c: F.round(F.col(c).cast("double") * scale)
        .cast("decimal(18,0)")
        .alias(c)
        for c in cols
    }
    base = df.select(*snapped.values())
    aggs = []
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        va = F.when(both, F.col(a))
        vb = F.when(both, F.col(b))
        tag = f"{a}__{b}"
        aggs += [
            F.count(F.when(both, F.lit(1))).cast("long").alias(f"n_{tag}"),
            F.sum(va).cast("decimal(38,0)").alias(f"sa_{tag}"),
            F.sum(vb).cast("decimal(38,0)").alias(f"sb_{tag}"),
            F.sum(va * F.col(a)).cast("decimal(38,0)").alias(f"saa_{tag}"),
            F.sum(vb * F.col(b)).cast("decimal(38,0)").alias(f"sbb_{tag}"),
            F.sum(va * F.col(b)).cast("decimal(38,0)").alias(f"sab_{tag}"),
        ]
    wide = base.agg(*aggs)
    rows = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"n_{a}__{b}").alias("n"),
            F.col(f"sa_{a}__{b}").alias("sum_a"),
            F.col(f"sb_{a}__{b}").alias("sum_b"),
            F.col(f"saa_{a}__{b}").alias("sum_aa"),
            F.col(f"sbb_{a}__{b}").alias("sum_bb"),
            F.col(f"sab_{a}__{b}").alias("sum_ab"),
        )
        for a, b in pairs
    ]
    return wide.select(F.inline(F.array(*rows)))
