"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how target-like its
hashed n-gram distribution is, so a 100 TB crawl can be resampled
toward a high-quality target domain with one cheap pass.

Method (public paper, re-expressed Spark-first):
- features = unigrams + word bigrams, hashed into B buckets with the
  package-wide md5 construction (`sampling.md5_long` — bit-identical in
  Spark / DuckDB / Python, so the oracle replays the exact hash).
- fit two bag-of-buckets models with Laplace smoothing: p_target over
  the target slice, p_raw over the whole corpus.
- per-doc log importance weight
      log w(d) = sum_b c_d(b) * (ln p_target(b) - ln p_raw(b));
  resampling then keeps docs with Gumbel-perturbed top weights — the
  deterministic sampling tier (`sampling.weighted_sample_per_key`)
  composes on top.

Shape at scale (the 100 TB direction):
- feature extraction is a map-side projection (split + zip_with slices,
  whole-stage codegen; no Python).
- each model fit is ONE aggregation over at most B buckets after
  map-side partial aggregation — the shuffle carries bucket partial
  counts, never text.
- the per-bucket log-ratio table has exactly B rows -> broadcast join;
  scoring is one per-doc aggregation carrying (id, partial long sum).
- log-ratios are accumulated as micro-ints (round(x*1e6) summed as
  BIGINT) so the weight is bit-stable under any partitioning and
  engine-portable (the oracle does identical integer math).

Reference parity: the reference engine admits every blob unscored
(JobMonitor.cs predicates are type-based only); this extends the
LLM-data-pipeline operator set the same way lm_score/textstats do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.sampling import md5_long


def hashed_feature_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """(id, bucket, c): per-doc counts of hashed unigram+bigram features.

    Tokens split on whitespace; bigrams joined with a single space;
    bucket = md5_long(feature || salt) % n_buckets. Pure expressions up
    to the (id, bucket) count — the explode never leaves the map side
    uncombined (partial aggregation collapses repeats before the
    exchange)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"), toks.alias("toks")
    )
    # bigrams via aligned slices: zip_with(toks[0:n-1], toks[1:n], concat)
    feats = base.select(
        "id",
        F.explode(
            F.concat(
                F.col("toks"),
                F.zip_with(
                    F.expr("slice(toks, 1, size(toks) - 1)"),
                    F.expr("slice(toks, 2, size(toks) - 1)"),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            )
        ).alias("feat"),
    )
    return (
        feats.select("id", (md5_long(F.col("feat"), salt) % n_buckets).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("c"))
    )


def _bucket_logp(
    feats: DataFrame, n_buckets: int, alpha: float, out_col: str
) -> DataFrame:
    """(bucket, <out_col>): Laplace-smoothed ln p(bucket) over the given
    per-doc feature counts. Buckets absent from the corpus simply have
    no row — consumers coalesce to the smoothed floor ln(alpha / (total
    + alpha * B))."""
    counts = feats.groupBy("bucket").agg(F.sum("c").alias("cb"))
    stats = counts.agg(F.sum("cb").cast("double").alias("total"))
    return counts.crossJoin(F.broadcast(stats)).select(
        "bucket",
        F.log(
            (F.col("cb") + F.lit(alpha))
            / (F.col("total") + F.lit(alpha) * F.lit(float(n_buckets)))
        ).alias(out_col),
        (F.col("total") + F.lit(alpha) * F.lit(float(n_buckets))).alias(
            out_col + "_den"
        ),
    )


def dsir_log_weights(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Per-doc DSIR log importance weight toward the `is_target` slice.

    Returns (id_col, n_feats, log_weight) for EVERY input doc (empty
    docs score 0.0 with n_feats=0). p_raw is fit on the whole corpus,
    p_target on the rows where `is_target` evaluates true; both live on
    the same hashed-bucket vocabulary so the ratio table is exactly
    <= n_buckets rows and broadcasts."""
    feats = hashed_feature_buckets(docs, id_col, text_col, n_buckets, salt)
    flagged = docs.select(F.col(id_col).alias("id"), is_target.alias("_t"))
    feats_flagged = feats.join(flagged, "id")

    raw = _bucket_logp(feats, n_buckets, alpha, "logp_raw")
    tgt = _bucket_logp(
        feats_flagged.filter(F.col("_t")), n_buckets, alpha, "logp_tgt"
    )
    # smoothed floors for buckets unseen in one of the models: the
    # denominators are constant per model; carry one copy of each
    floors = F.broadcast(
        raw.agg(F.min("logp_raw_den").alias("_rden")).crossJoin(
            tgt.agg(F.min("logp_tgt_den").alias("_tden"))
        )
    )
    # an empty target slice would make _tden NULL, every ratio NULL, and
    # the final coalesce would hand back log_weight 0.0 for EVERY doc —
    # a silent uniform sampler. Fail loudly instead (lazily, riding the
    # plan: the floors frame is one row, so the check costs nothing).
    tden = F.when(
        F.col("_tden").isNull(),
        F.raise_error(
            F.lit(
                "dsir_log_weights: is_target matched zero rows — the "
                "target model is empty; check the predicate"
            )
        ).cast("double"),
    ).otherwise(F.col("_tden"))
    rden = F.when(
        F.col("_rden").isNull(),
        F.raise_error(
            F.lit("dsir_log_weights: corpus produced zero features")
        ).cast("double"),
    ).otherwise(F.col("_rden"))
    ratio = (
        raw.join(tgt, "bucket", "outer")
        .crossJoin(floors)
        .select(
            "bucket",
            F.round(
                (
                    F.coalesce(F.col("logp_tgt"), F.log(F.lit(alpha) / tden))
                    - F.coalesce(F.col("logp_raw"), F.log(F.lit(alpha) / rden))
                )
                * 1e6
            )
            .cast("long")
            .alias("mratio"),
        )
    )
    scored = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("mratio")) / 1e6, 6).alias(
                "log_weight"
            ),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )
