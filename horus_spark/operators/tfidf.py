"""TF-IDF sparse lexical similarity: document pairs by cosine over
df-pruned term vectors.

This is the TERM-vector sibling of the embedding near-dup family
(similarity.py): embedding cosine catches semantic duplication,
TF-IDF cosine catches lexical-overlap duplication with interpretable
weights and no model — the classic pre-neural near-dup / related-doc
measure (Salton's vector space model; the same weighting Lucene's
ClassicSimilarity used).

Weighting (documented, replayed exactly by the oracle):
    tf-idf(t, d) = tf(t,d) * idf(t);  idf(t) = ln((N + 1)/(df(t) + 1)) + 1
(the smoothed idf sklearn's TfidfVectorizer defaults to — never
negative, never divides by zero). Cosine = dot / (norm_a * norm_b)
over the RETAINED vocabulary (see pruning below).

Shape at scale (the 100 TB direction):
- the pair generation is an inverted-index self-join on term. Its
  fan-out per term is |posting list|^2, so the operator REQUIRES a
  document-frequency cap: terms with df > max_df (stopword-ish hot
  terms that dominate join cost but carry the least signal) and terms
  with df < 2 (singleton terms can never create a pair) are dropped
  BEFORE the join. Every posting list entering the join has between 2
  and max_df entries — worst-case join work is bounded at
  vocab * max_df^2 instead of vocab * corpus^2.
- cosine is computed over the pruned vocabulary, norms included: the
  result is the exact cosine of the pruned vectors (standard practice;
  the docstring of each caller should say "df-pruned cosine"). Dropping
  hot terms from the NORM as well keeps the measure a true cosine
  (bounded by 1) rather than a deflated dot product.
- tf, df, and norms are each ONE hash aggregation with map-side
  combine; df/idf re-attach via a hash join keyed on the term itself
  (no forced broadcast — the retained vocabulary is corpus-derived and
  can be arbitrarily large; AQE broadcasts it when it actually fits).
- the dot-product aggregation shuffles only (id_a, id_b, w_a*w_b) —
  never text, never full vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.decontam import _norm_text


def tfidf_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int,
) -> DataFrame:
    """(id, term, w) postings with smoothed-idf tf-idf weights over the
    df-pruned vocabulary (2 <= df <= max_df). N in the idf is the FULL
    corpus document count (computed before pruning)."""
    if max_df < 2:
        raise ValueError("max_df must be >= 2")
    toks = F.split(_norm_text(F.col(text_col)), " ")
    terms = (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select("id", F.explode("_toks").alias("term"))
        .filter(F.length("term") > 0)
    )
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    kept = df_t.filter((F.col("df_t") >= 2) & (F.col("df_t") <= max_df))
    n_docs = F.broadcast(
        df.select(F.col(id_col)).agg(F.count("*").cast("double").alias("n_docs"))
    )
    return (
        # no broadcast hint: the retained vocabulary is corpus-derived
        # (web-scale it is billions of terms); a hash join on `term`
        # co-partitions with the tf aggregation, and AQE still picks a
        # broadcast when the pruned vocab actually fits.
        tf.join(kept, "term")
        .crossJoin(n_docs)
        .select(
            "id",
            "term",
            (
                F.col("tf").cast("double")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df_t") + 1.0))
                    + F.lit(1.0)
                )
            ).alias("w"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int = 50,
) -> DataFrame:
    """All document pairs with df-pruned TF-IDF cosine >= threshold.

    Returns (id_a, id_b, cosine_sim rounded to 6dp), id_a < id_b under
    the id column's native ordering. Pairs sharing no retained term
    never materialize (the index only proposes co-occurring docs).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    postings = tfidf_postings(df, id_col, text_col, max_df)
    norms = postings.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    a = postings.select(
        F.col("id").alias("id_a"), "term", F.col("w").alias("w_a")
    )
    b = postings.select(
        F.col("id").alias("id_b"), "term", F.col("w").alias("w_b")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("nb"))
    # threshold on the ROUNDED cosine: the dot is a float sum whose last
    # ulp is summation-order-dependent, so the keep/drop decision must be
    # made on the same 6dp-snapped value every engine computes.
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "cosine_sim", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
