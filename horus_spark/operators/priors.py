"""Empirical-Bayes domain priors — the smoothed per-domain quality
signal crawl scheduling and corpus mixing actually consume. A raw
per-domain keep-rate is garbage at the tail: a domain with 2 documents
and 2 keeps is not a 100%-quality domain. The standard fix (Beta
shrinkage / "add the global prior as s pseudo-counts") pulls small
domains toward the corpus mean while leaving big domains at their own
measured rate:

    shrunk = (k_d + s * K/N) / (n_d + s)

where k_d/n_d are the domain's keeps/docs, K/N the corpus totals, and
s the prior strength in pseudo-docs. CCNet-style pipelines rank hosts
by exactly this kind of smoothed score before deciding crawl budgets
and inclusion tiers.

Determinism: the shrunk rate is computed as ONE exact integer division
in parts-per-million —

    shrunk_ppm = (k_d * N + s * K) * 1e6  div  ((n_d + s) * N)

— with products in DECIMAL(38,0) (HUGEINT in the oracle): at 10^12
documents the numerator reaches ~1e30, far past int64 but exact in
both engines, so the result is bit-identical everywhere and no float
ratio ever enters the plan.

Shape at scale: one corpus aggregation keyed by domain (map-side
combine; the Exchange carries (domain, two longs)), one broadcast
global scalar, and a bounded per-domain projection. No windows, no
joins on corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shrunk_keep_rate(
    df: DataFrame,
    keep_col: str = "keep",
    group_col: str = "domain",
    strength: int = 50,
) -> DataFrame:
    """Per-group empirical-Bayes smoothed keep rate. `keep_col` is a
    boolean (or 0/1) per-document verdict — a classifier decision, a
    quality-gate pass, a dedup survival. Returns
    (group_col, n_docs:long, n_keep:long, raw_ppm:long, shrunk_ppm:long)
    where raw_ppm = k*1e6 div n and shrunk_ppm applies `strength`
    pseudo-docs of the corpus-wide rate. strength=0 degenerates to the
    raw rate (pinned by pytest)."""
    if strength < 0:
        raise ValueError(f"need strength >= 0, got {strength}")
    keep = F.col(keep_col).cast("boolean").cast("long")
    per = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"), F.sum(keep).alias("n_keep")
    )
    tot = F.broadcast(
        per.agg(
            F.sum("n_docs").alias("_N"), F.sum("n_keep").alias("_K")
        )
    )
    s = int(strength)
    shrunk = F.expr(
        f"CAST(((CAST(n_keep AS DECIMAL(38,0)) * _N"
        f" + CAST({s} AS DECIMAL(38,0)) * _K) * 1000000)"
        f" div (CAST(n_docs + {s} AS DECIMAL(38,0)) * _N) AS BIGINT)"
    )
    return per.crossJoin(tot).select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_keep").cast("long").alias("n_keep"),
        F.expr(
            "CAST((n_keep * CAST(1000000 AS BIGINT)) div n_docs AS BIGINT)"
        ).alias("raw_ppm"),
        shrunk.alias("shrunk_ppm"),
    )
