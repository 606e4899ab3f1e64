"""BM25 corpus ranking: score documents against a query term set.

The standard Okapi BM25 formula (Robertson & Walker; the Lucene/
Elasticsearch default retrieval model):

    score(d, q) = sum over t in q of
        idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b * |d|/avgdl))
    idf(t) = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

Shape at scale (the 100 TB direction):
- query terms are pruned MAP-SIDE before anything aggregates: the
  explode -> isin(query_terms) filter means only rows for query terms
  ever reach a shuffle. The corpus-wide posting list is never built.
- tf is one (doc, term) hash aggregation with map-side combine; df(t)
  is a second aggregation over the already-tiny tf frame.
- corpus stats (N, avgdl) are a scalar aggregate crossJoin-broadcast —
  no driver-side collect in the plan.
- df/idf per query term is at most |q| rows — broadcast back onto tf.
- top-k resolves as TakeOrderedAndProject (never a full sort).

Tokenization mirrors decontam's normalization (lower, strip
non-alphanumerics, collapse whitespace) so ranking and contamination
probes agree on what a "term" is.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.decontam import _norm_text


def normalize_query(query: str) -> list[str]:
    """Driver-side twin of _norm_text + split: distinct query terms."""
    norm = re.sub(r"\s+", " ", query.lower())
    norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", norm)).strip()
    seen: dict[str, None] = {}
    for t in norm.split(" "):
        if t:
            seen.setdefault(t, None)
    return list(seen)


def bm25_topk(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for `query`. Returns
    (id_col, score, n_matched_terms), deterministic tie-break by id.
    Documents matching no query term never appear (score would be 0)."""
    terms = normalize_query(query)
    if not terms:
        raise ValueError("query has no terms after normalization")

    toks = F.split(_norm_text(F.col(text_col)), " ")
    base = docs.select(
        F.col(id_col).alias("id"),
        F.when(F.length(_norm_text(F.col(text_col))) > 0, F.size(toks))
        .otherwise(F.lit(0))
        .alias("dl"),
        toks.alias("_toks"),
    )

    # corpus stats: scalar aggregate, broadcast — no driver action
    stats = F.broadcast(
        base.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )

    # map-side prune to query terms BEFORE the tf aggregation
    matched = (
        base.select("id", "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = matched.groupBy("id", "dl", "term").agg(F.count("*").alias("tf"))
    df_t = F.broadcast(tf.groupBy("term").agg(F.count("*").cast("double").alias("df")))

    scored = (
        tf.join(df_t, "term")
        .crossJoin(stats)
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("id")
        .agg(
            F.round(F.sum("term_score"), 6).alias("score"),
            F.count("*").alias("n_matched_terms"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "score", "n_matched_terms")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke, Buettcher 2009) — the
    standard score-free way to combine heterogeneous retrieval tiers
    (lexical BM25 + dense ANN is the canonical "hybrid search" pair):

        rrf(d) = sum over lists L containing d of 1 / (k + rank_L(d))

    Each input frame is one ranked list: (id_col, rank_col) with rank
    starting at 1. Scores from the source rankers are deliberately NOT
    used — RRF only consumes ranks, so tiers with incomparable score
    scales (BM25 floats vs cosine vs popularity counts) fuse without
    calibration.

    Shape at scale: each candidate list is already top-k-bounded by its
    producer, so the union is tiny relative to the corpus; the fuse is
    ONE hash aggregation over (lists x k) rows and the final ordering
    resolves as TakeOrderedAndProject when `topk` is set. The fused
    score is a sum of exact dyadic-free rationals evaluated identically
    in any engine at double precision; output is rounded to 6dp with a
    deterministic id tie-break.

    Returns (id_col, rrf_score: double, n_lists: int).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    parts = [
        r.select(
            F.col(id_col).alias("_id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "_contrib"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for nxt in parts[1:]:
        u = u.unionByName(nxt)
    fused = u.groupBy("_id").agg(
        F.round(F.sum("_contrib"), 6).alias("rrf_score"),
        F.count("*").alias("n_lists"),
    )
    out = fused.select(F.col("_id").alias(id_col), "rrf_score", "n_lists")
    if topk is not None:
        out = out.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(topk)
    return out
