"""Corpus-model quality scoring (CCNet-style): score every document by
the mean log-probability of its tokens under a unigram language model
fit on the corpus itself (or on a reference corpus passed separately).
Low mean logprob = unusual token distribution = likely noise/gibberish;
CCNet buckets documents into quality tiers exactly this way (with a
5-gram KenLM; the unigram tier is the same pipeline shape and the
composition point for a better model).

Shape at scale (the 100 TB direction):
- model fit = ONE (token, count) aggregation with map-side combine —
  the shuffle carries vocabulary-sized partial counts, not the corpus.
- Laplace smoothing keeps out-of-vocabulary tokens finite when scoring
  against a separate reference model.
- scoring = explode -> broadcast join on token (vocab is small relative
  to any corpus; for a vocabulary too big to broadcast, the join falls
  back to a shuffle equi-join on uniformly-distributed token keys) ->
  one per-doc aggregation carrying (id, partial sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_unigram_model(
    docs: DataFrame, text_col: str = "text", alpha: float = 1.0
) -> DataFrame:
    """(token, logp) with Laplace-alpha smoothing: logp = ln((c + alpha)
    / (total + alpha * (vocab + 1))); the +1 reserves mass for unseen
    tokens, whose logp is ln(alpha / (total + alpha * (vocab + 1)))."""
    toks = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    counts = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(toks)
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    stats = counts.agg(
        F.sum("c").cast("double").alias("total"),
        F.count("*").cast("double").alias("vocab"),
    )
    return counts.crossJoin(F.broadcast(stats)).select(
        "token",
        F.log(
            (F.col("c") + F.lit(alpha))
            / (F.col("total") + F.lit(alpha) * (F.col("vocab") + 1.0))
        ).alias("logp"),
        F.log(
            F.lit(alpha)
            / (F.col("total") + F.lit(alpha) * (F.col("vocab") + 1.0))
        ).alias("oov_logp"),
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per doc: token count, mean token log-probability under the
    unigram model (self-fit when model=None), and OOV count. Returns
    (id_col, n_tokens, mean_logp, n_oov); empty docs keep a row with
    n_tokens=0, mean_logp=0.0."""
    if model is None:
        model = fit_unigram_model(docs, text_col, alpha)
    if broadcast_model:
        model = F.broadcast(model)
    # every model row carries the same oov_logp; keep one copy for misses
    oov = F.broadcast(model.agg(F.min("oov_logp").alias("_oov")))

    exploded = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
        )
    )
    # aggregate integer micro-logprobs: double summation is
    # order-dependent (partitioning would perturb the 6th decimal at the
    # margin); summing longs is exact, so the mean is deterministic and
    # engine-portable (the oracle does the identical micro-int math)
    micro = F.round(F.coalesce(F.col("logp"), F.col("_oov")) * 1e6).cast("long")
    scored = (
        exploded.join(model.select("token", "logp"), "token", "left")
        .crossJoin(oov)
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(micro) / (F.count("*") * F.lit(1e6)), 6
            ).alias("mean_logp"),
            F.sum(F.col("logp").isNull().cast("long")).alias("n_oov"),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("mean_logp", F.lit(0.0)).alias("mean_logp"),
        F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
    )


def ccnet_tiers(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """The CCNet quality DECISION: rank every document by its unigram-LM
    mean log-probability and cut the corpus into head / middle / tail
    thirds (Wenzek et al. 2020 keep the head, sometimes the middle, and
    drop the tail).

    The cut is RANK-based, not value-interpolated: tier =
    ((rank-1) * 3) div n over the total order (mean_logp descending,
    id ascending). Interpolated tercile BOUNDARIES (percentile at 1/3)
    are not engine-portable — 1/3 is not a dyadic fraction, so two
    engines' interpolation formulas can disagree by an ULP and flip a
    boundary document; integer rank arithmetic cannot. The ranking
    itself is `global_row_number`'s two-level recipe (no single-task
    sort), keyed on the negated score so the best documents rank first.

    Output: (id_col, n_tokens, mean_logp, tier) with tier in
    {'head', 'middle', 'tail'}; every input document gets a row.
    """
    scored = lm_score(
        docs, model=model, id_col=id_col, text_col=text_col, alpha=alpha
    )
    from horus_spark.operators.indexing import global_row_number

    ranked = global_row_number(
        scored.withColumn("_neg", -F.col("mean_logp")),
        ["_neg", id_col],
        out_col="_rank",
    ).drop("_neg")
    total = F.broadcast(scored.agg(F.count(F.lit(1)).alias("_n")))
    tier_idx = F.expr("((_rank - 1) * 3) div _n")
    return (
        ranked.crossJoin(total)
        .withColumn(
            "tier",
            F.when(tier_idx == 0, F.lit("head"))
            .when(tier_idx == 1, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .select(id_col, "n_tokens", "mean_logp", "tier")
    )
