"""Class-based TF-IDF labeling (the BERTopic c-TF-IDF step): name each
document class — a cluster, a domain, a language slice — by its most
DISTINCTIVE terms, not its most frequent ones ("the" tops every class;
what separates classes is what labels them).

Formula (Grootendorst 2022, restated in engine-exact arithmetic):

    tf_norm_ppm(t, c) = count(t in c) * 1e6 div tokens(c)
    idf_micro(t)      = round(ln(1 + A / f(t)) * 1e6)
                        (A = average tokens per class, f(t) = the
                        term's CORPUS frequency — Grootendorst's
                        actual reduction: ubiquitous high-frequency
                        terms get a small idf even when they appear
                        in every class; the micro-nat snap is the
                        q80/q142 convention — round(ln * 1e6) is
                        bit-identical across engines on identical
                        double inputs)
    score             = tf_norm_ppm * idf_micro   (exact long product)

Top-k terms per class by (score DESC, term ASC) — fully deterministic.

Scale shape: one (class, term) count aggregation with map-side combine,
one tiny class-totals aggregate joined back, a |vocab|-bounded df
aggregate, and a WindowGroupLimit top-k — no corpus-sized shuffle
beyond the first counting pass. Tokenization is the corpus-standard
lower + non-alphanumeric strip, so labels align with the BM25/decontam
term space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horus_spark.operators.decontam import _norm_text


def class_tfidf_labels(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Top-k distinctive label terms per class; see module docstring.
    Returns (group, rank, term, tf_norm_ppm, idf_micro, score).
    Terms with class count < min_count are pruned before any join
    (hapax noise cannot label a class)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = F.split(_norm_text(F.col(text_col)), " ")
    words = (
        df.select(F.col(group_col).alias("group"), toks.alias("_t"))
        .select("group", F.explode("_t").alias("term"))
        .where(F.col("term") != "")
    )
    tf = (
        words.groupBy("group", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
    )
    totals = words.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("tok")
    )
    avg_tokens = F.broadcast(
        totals.agg(
            (F.sum("tok") / F.count(F.lit(1))).alias("a_tokens")
        )
    )
    # corpus frequency over the UNPRUNED stream: f(t) counts every
    # occurrence, including those in below-min_count classes
    freq = words.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("f")
    )
    scored = (
        tf.join(totals, "group")
        .join(freq, "term")
        .crossJoin(avg_tokens)
        .select(
            "group",
            "term",
            F.expr(
                "CAST(c * CAST(1000000 AS BIGINT) div tok AS BIGINT)"
            ).alias("tf_norm_ppm"),
            F.round(F.log(1.0 + F.col("a_tokens") / F.col("f")) * 1e6)
            .cast("long")
            .alias("idf_micro"),
        )
        .withColumn(
            "score", F.col("tf_norm_ppm") * F.col("idf_micro")
        )
    )
    w = Window.partitionBy("group").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "group",
            F.col("rank").cast("int").alias("rank"),
            "term",
            "tf_norm_ppm",
            "idf_micro",
            "score",
        )
    )
