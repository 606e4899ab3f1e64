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


def _bigram_pairs(tcol: "F.Column") -> "F.Column":
    """array<struct<w1,w2>> of adjacent token pairs; empty for < 2
    tokens (CASE is lazily evaluated per row, so the slice expressions
    never see an out-of-range length — same guard as _shingle_array)."""
    n = F.size(tcol)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(tcol, F.lit(1), n - 1),
            F.slice(tcol, F.lit(2), n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def bigram_lm_score(
    docs: DataFrame,
    ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.5,
    alpha: float = 1.0,
    broadcast_bigrams: bool = False,
) -> DataFrame:
    """Per-document mean BIGRAM log-probability under an interpolated
    backoff model fit on `ref` (defaults to self-fit):

        p(w2 | w1) = lam * c(w1 w2)/c(w1 .)  +  (1-lam) * p_uni(w2)

    with Laplace-alpha unigram smoothing, so unseen bigrams back off to
    the unigram term and unseen unigrams to the reserved OOV mass —
    p > 0 always. This is the CCNet shape one order up from lm_score's
    unigram tier: fit on a trusted reference slice, score the crawl;
    fluent text scores high, token salad with plausible unigrams but
    implausible transitions scores low.

    Determinism: each scored bigram's log-probability is rounded to an
    integer micro-logprob and SUMMED AS LONGS (order-independent, the
    lm_score convention), so the mean is engine-portable; every
    floating step before ln is IEEE-exactly specified (divisions, *0.5,
    one addition).

    Scale: model fit = two aggregations over the reference (bigram and
    unigram counts, map-side combine); scoring = one explode + an
    equi-join on (w1, w2) — bigram vocabularies are too large to assume
    broadcastable, so the join shuffles on uniformly-distributed token
    keys unless broadcast_bigrams=True; the unigram side is always
    broadcast. Returns (id_col, n_bigrams, mean_logp, n_unseen); docs
    with < 2 tokens keep a row with n_bigrams=0, mean_logp=0.0."""
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0,1), got {lam}")
    if ref is None:
        ref = docs
    nonblank = F.length(F.trim(F.col(text_col))) > 0
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    rt = ref.filter(nonblank).select(toks.alias("t"))
    rbig = rt.select(F.explode(_bigram_pairs(F.col("t"))).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    c12 = rbig.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("c12"))
    c1 = rbig.groupBy("w1").agg(F.count("*").cast("double").alias("c1"))
    uc = (
        rt.select(F.explode("t").alias("w2"))
        .groupBy("w2")
        .agg(F.count("*").cast("double").alias("c"))
    )
    stats = uc.agg(
        F.sum("c").alias("total"), F.count("*").cast("double").alias("vocab")
    )
    denom = F.col("total") + F.lit(alpha) * (F.col("vocab") + 1.0)
    pu = uc.crossJoin(F.broadcast(stats)).select(
        "w2", ((F.col("c") + F.lit(alpha)) / denom).alias("pu")
    )
    oov = F.broadcast(stats.select((F.lit(alpha) / denom).alias("oov_p")))
    if broadcast_bigrams:
        c12, c1 = F.broadcast(c12), F.broadcast(c1)

    sbig = docs.filter(nonblank).select(
        F.col(id_col).alias("id"), F.explode(_bigram_pairs(toks)).alias("bg")
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    p = (
        F.lit(lam) * F.coalesce(F.col("c12") / F.col("c1"), F.lit(0.0))
        + F.lit(1.0 - lam) * F.coalesce(F.col("pu"), F.col("oov_p"))
    )
    micro = F.round(F.log(p) * 1e6).cast("long")
    agg = (
        sbig.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(F.broadcast(pu), "w2", "left")
        .crossJoin(oov)
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum(micro) / (F.count("*") * F.lit(1e6)), 6).alias(
                "mean_logp"
            ),
            F.sum(F.col("c12").isNull().cast("long")).alias("n_unseen"),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(agg, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("mean_logp", F.lit(0.0)).alias("mean_logp"),
        F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
    )
