"""Hashed linear quality classifier — the fastText-shaped filter tier
(Joulin et al. 2017) every large pretraining corpus runs: fit a linear
model over hashing-trick n-gram features on a small labeled slice
(reference-vs-crawl, quality-vs-junk, English-vs-other), then score the
whole corpus map-side. GPT-3, LLaMA and PaLM all gate their web data on
exactly this classifier shape; this module is the distributed inference
AND training path for it.

The model here is multinomial Naive Bayes log-odds over hashed
unigram + bigram features — linear in the same feature space fastText
uses, trainable in ONE aggregation pass (no SGD iterations), and exactly
replayable in SQL, which keeps the oracle honest. A model trained
elsewhere (fastText itself, sklearn) can be scored by loading its
weights into the same (bucket, w_micro) frame.

Shape at scale (the 100 TB direction):
- feature extraction is a pure map-side array expression (split, bigram
  zip, md5 bucket) — zero Exchange on corpus rows before the per-doc sum;
- training = one explode + ONE hash aggregation whose output is bounded
  by n_buckets (<= 2^20 rows of three longs), not the corpus: map-side
  combine collapses within-partition repeats before the Exchange;
- scoring joins the BROADCAST weight table (n_buckets-bounded) and sums
  integer micro-nat weights per doc — order-independent long addition,
  so the score is partitioning-invariant and engine-portable (the
  lm_score convention).

Determinism: every weight is ln of a ratio of exact integer counts,
rounded once to integer micro-nats; scores are sums of those longs plus
the bias. Two engines computing the same ln round to the same micro-nat
(pinned by the q57/q78 precedent and this module's oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.sampling import md5_long

#: sentinel bucket ids inside the model frame (documented contract):
#: BIAS_BUCKET carries the class-prior log-odds added to every score;
#: UNSEEN_BUCKET carries the weight of any bucket with no training hits
#: (smoothing gives those a constant non-zero log-odds).
BIAS_BUCKET = -1
UNSEEN_BUCKET = -2

_MICRO = 1e6


def _features_expr(text: F.Column, n_buckets: int) -> F.Column:
    """array<int> of hashed feature buckets for one document: word
    unigrams plus adjacent bigrams joined with a single space (tokens
    cannot contain whitespace, so a bigram string never aliases a
    unigram). Empty/blank text -> empty array. Pure expression — no
    shuffle, no Python."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.concat(toks, bigrams))
    return F.transform(
        feats, lambda s: (md5_long(s, "clf") % n_buckets).cast("int")
    )


def fit_hashed_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit Naive Bayes log-odds weights over hashed features from a
    labeled frame (`label_col` boolean or 0/1: True = the class to
    keep). Returns the MODEL frame (bucket:int, w_micro:long):

      w(b)  = ln((pos_b + a)/(pos_tot + a*B)) - ln((neg_b + a)/(neg_tot + a*B))
      bias  = ln((n_pos + a)/(n_neg + a))              -> bucket BIAS_BUCKET
      w(unseen bucket) = ln(neg_tot + a*B) - ln(pos_tot + a*B)
                                                       -> bucket UNSEEN_BUCKET

    all in integer micro-nats. The frame is n_buckets-bounded (plus the
    two sentinel rows) and is meant to be broadcast by the scorer.
    Training is one explode + one bucket-keyed aggregation with map-side
    combine; the Exchange carries at most B partial rows per task."""
    if n_buckets < 2:
        raise ValueError(f"need n_buckets >= 2, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"need alpha > 0, got {alpha}")
    lab = F.col(label_col).cast("boolean")
    base = docs.select(
        lab.alias("_y"), _features_expr(F.col(text_col), n_buckets).alias("_f")
    )
    counts = (
        base.select("_y", F.explode("_f").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.col("_y").cast("long")).alias("pos"),
            F.sum((~F.col("_y")).cast("long")).alias("neg"),
        )
    )
    # bounded: n_buckets rows at most -> totals are a tiny second agg
    tot = F.broadcast(
        counts.agg(
            F.sum("pos").cast("double").alias("pos_tot"),
            F.sum("neg").cast("double").alias("neg_tot"),
        )
    )
    ndocs = F.broadcast(
        base.agg(
            F.sum(F.col("_y").cast("long")).cast("double").alias("n_pos"),
            F.sum((~F.col("_y")).cast("long")).cast("double").alias("n_neg"),
        )
    )
    a, aB = F.lit(float(alpha)), F.lit(float(alpha * n_buckets))
    w = F.log((F.col("pos") + a) / (F.col("pos_tot") + aB)) - F.log(
        (F.col("neg") + a) / (F.col("neg_tot") + aB)
    )
    weights = counts.crossJoin(tot).select(
        "bucket", F.round(w * _MICRO).cast("long").alias("w_micro")
    )
    bias = ndocs.select(
        F.lit(BIAS_BUCKET).alias("bucket"),
        F.round(
            F.log((F.col("n_pos") + a) / (F.col("n_neg") + a)) * _MICRO
        ).cast("long").alias("w_micro"),
    )
    unseen = tot.select(
        F.lit(UNSEEN_BUCKET).alias("bucket"),
        F.round(
            (F.log(F.col("neg_tot") + aB) - F.log(F.col("pos_tot") + aB))
            * _MICRO
        ).cast("long").alias("w_micro"),
    )
    return weights.unionAll(bias).unionAll(unseen)


def classifier_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Score every document under a fit_hashed_classifier model:
    score_micro = bias + sum over features of w(bucket) (unseen buckets
    take the UNSEEN_BUCKET weight), keep = score_micro >= 0.

    `n_buckets` MUST match the fit — it defines the hash family, not a
    tuning knob. The model is broadcast (n_buckets-bounded); corpus rows
    see one map-side feature projection, the broadcast join, and one
    per-doc long-sum aggregation. Returns
    (id_col, n_feats, score_micro, keep); every input doc gets a row
    (empty docs score the bias alone)."""
    # the model is n_buckets-bounded BY CONSTRUCTION, so collect it ONCE
    # (a lazy sentinel filter + a separate broadcast of the same frame
    # would execute the training aggregation twice) and ship the weights
    # back as a local relation — Spark broadcasts it without recomputing
    # any lineage
    rows = [(int(r["bucket"]), int(r["w_micro"])) for r in model.collect()]
    sent = {b: w for b, w in rows if b < 0}
    if BIAS_BUCKET not in sent or UNSEEN_BUCKET not in sent:
        raise ValueError(
            "model frame is missing its bias/unseen sentinel rows; "
            "was it produced by fit_hashed_classifier?"
        )
    bias, unseen_w = int(sent[BIAS_BUCKET]), int(sent[UNSEEN_BUCKET])
    weights = docs.sparkSession.createDataFrame(
        [(b, w) for b, w in rows if b >= 0] or [(0, 0)],
        "bucket int, w_micro long",
    )
    if not any(b >= 0 for b, _ in rows):
        # degenerate empty-vocabulary model: keep an impossible bucket
        # row so the left join below stays well-formed
        weights = weights.filter(F.col("bucket") < 0)

    feats = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(_features_expr(F.col(text_col), n_buckets)).alias(
            "bucket"
        ),
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy("id")
        .agg(
            F.count(F.col("bucket")).alias("n_feats"),
            (
                F.lit(bias)
                + F.coalesce(
                    F.sum(
                        F.when(F.col("bucket").isNull(), F.lit(0)).otherwise(
                            F.coalesce(F.col("w_micro"), F.lit(unseen_w))
                        )
                    ),
                    F.lit(0),
                )
            ).cast("long").alias("score_micro"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        F.col("n_feats").cast("long").alias("n_feats"),
        "score_micro",
        (F.col("score_micro") >= 0).alias("keep"),
    )
