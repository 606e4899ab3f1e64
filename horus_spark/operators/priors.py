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
from pyspark.sql.window import Window


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


def percentile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group percentile normalization — the calibration step
    between raw quality scores and a corpus-wide keep threshold: a
    classifier's scores are not comparable across domains (boilerplate
    norms, language, register all shift the distribution), so curation
    recipes cut at a PER-GROUP percentile instead of a global score
    (the CCNet head/middle/tail idea generalized to any score/group).

    pct_ppm = (rank - 1) * 1e6 div (n_group - 1), rank by
    (score ASC, id ASC) — row_number with an id tie-break rather than
    SQL percent_rank's shared-rank ties, so the output is a
    deterministic pure function of the data (two docs with equal
    scores get adjacent, reproducible percentiles). Singleton groups
    get 0. Returns (id, group, score, pct_ppm); NULL scores are
    dropped (they have no rank).

    Scale shape: ONE shuffle on the group key; the window computes
    row_number and the group count in the same pass. Skewed groups
    bound the window's partition size — pre-split giant groups with a
    salt upstream if one group dominates the corpus."""
    out = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(group_col).alias("group"),
            F.col(score_col).alias("score"),
        )
        .where(F.col(score_col).isNotNull())
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("group").orderBy(
                F.col("score").asc(), F.col("id").asc()
            )
        ))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("group")))
    )
    return out.select(
        "id",
        "group",
        "score",
        F.expr(
            "CAST((_rn - 1) * CAST(1000000 AS BIGINT)"
            " div greatest(_n - 1, 1) AS BIGINT)"
        ).alias("pct_ppm"),
    )
