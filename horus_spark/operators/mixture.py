"""Temperature-scaled domain mixture allocation (the mT5 / UniMax
sampling rule, Xue et al. 2021 arXiv:2010.11934 §3.1; Chung et al. 2023
UniMax arXiv:2304.09151): given per-domain corpus masses, compute each
domain's training sampling share p_d ∝ (tokens_d / total)^alpha and the
token allocation for a fixed training budget, with the implied epoch
count per domain (budget_d / tokens_d — the over-sampling multiplier
that UniMax caps).

Shape at scale: ONE aggregation over the corpus (map-side combined
token counts per domain; the shuffle carries |domains| partial sums),
then pure arithmetic over a frame with one row per domain. The
normalizer sums domain weights as micro-ints (round(w*1e9) summed as
BIGINT), so shares are bit-stable under any partitioning/agg order and
engine-portable — double summation order over domains would otherwise
leak into the 12th decimal of every share.

Reference parity: no analog in the reference engine (it processes every
admitted blob once); extends the LLM-data-pipeline operator set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temperature_mixture(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
    token_budget: int = 1_000_000,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per domain: (domain, n_docs, n_tokens, p_raw, p_mix,
    target_tokens, epochs) where p_mix ∝ p_raw^alpha normalized over
    domains, target_tokens = round(budget * p_mix) and epochs =
    target_tokens / n_tokens (how many passes over the domain the
    mixture implies; >1 flags over-sampling a small domain).

    `tokens_col` (optional): use a PRE-COMPUTED per-row token count
    instead of whitespace-tokenizing `text_col` — callers whose budget
    unit is not plain text tokens (e.g. the multimodal cost model of
    interleave.interleave_token_costs, where media spans cost constant
    vision-token blocks) pass their own column; `text_col` is then
    ignored."""
    if tokens_col is not None:
        n_toks = F.col(tokens_col)
    else:
        n_toks = F.when(
            F.length(F.trim(F.col(text_col))) > 0,
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")),
        ).otherwise(F.lit(0))
    per_dom = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_toks).cast("long").alias("n_tokens"),
    )
    total = per_dom.agg(F.sum("n_tokens").cast("double").alias("_total"))
    with_w = per_dom.crossJoin(F.broadcast(total)).withColumn(
        "_mw",
        F.round(
            F.pow(F.col("n_tokens") / F.col("_total"), F.lit(float(alpha))) * 1e9
        ).cast("long"),
    )
    norm = with_w.agg(F.sum("_mw").alias("_msum"))
    budget = float(int(token_budget))
    return (
        with_w.crossJoin(F.broadcast(norm))
        .select(
            "domain",
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_total"), 6).alias("p_raw"),
            F.round(F.col("_mw") / F.col("_msum"), 6).alias("p_mix"),
            F.round(F.lit(budget) * F.col("_mw") / F.col("_msum"))
            .cast("long")
            .alias("target_tokens"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.lit(budget) * F.col("_mw") / F.col("_msum") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("epochs"),
        )
    )
