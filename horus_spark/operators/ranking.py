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
    scored = (
        _term_scores(docs, terms, id_col, text_col, k1, b)
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


def _term_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str,
    text_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Per-(doc, query-term) BM25 contribution frame: (id, dl, term, tf,
    idf, term_score). Shared by the exhaustive scorer (bm25_topk) and
    the MaxScore-pruned tier (maxscore_topk) — identical arithmetic by
    construction."""
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
    df_t = F.broadcast(
        tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    )

    return (
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
    )


def maxscore_candidates(
    ts: DataFrame,
    k: int,
    k1: float,
) -> DataFrame:
    """MaxScore candidate set over a `_term_scores` frame: doc ids whose
    OPTIMISTIC score bound can still reach the top-k.

    The classic dynamic-pruning argument (Turtle & Flood 1995; the
    MaxScore used by Lucene's WAND family), restated for a batch plan:

    - per-term impact bound: term_score <= idf(t) * (k1 + 1) — the
      tf-saturation limit of the BM25 term formula, independent of tf
      and document length. At index time engines store this next to the
      posting list; here it is a |q|-row aggregate of the ts frame.
    - threshold seeding: the RAREST query term (max idf — the smallest
      posting with the largest contribution) is scored EXACTLY, and the
      k-th best seed score becomes the pruning threshold theta. Fewer
      than k seed docs -> theta = -inf (prune degrades to exhaustive,
      never to wrong).
    - prune: a doc whose sum of per-term bounds (over the terms it
      actually contains) is below theta cannot reach the top-k, because
      its true score <= that optimistic sum < theta <= true k-th best.
      Every true top-k doc survives: score >= k-th best >= theta and
      bound >= score. A one-ulp slack (1e-6, the output rounding grain)
      is subtracted from theta so 6-dp rounding collisions at the
      boundary cannot flip the final deterministic (score, id) order
      against the exhaustive scorer.

    Returns (id, ub_sum, theta) for surviving docs. Scale shape: the
    bound table and theta are broadcast scalars/|q|-rows; the seed
    scoring touches only the rare term's posting (semi-join); the prune
    is one slim (id, term) aggregation — the EXPENSIVE per-doc exact
    scoring and the top-k sort then run over the surviving fraction
    only, which on skewed web corpora (few rare informative terms, long
    common-term postings) is orders of magnitude smaller than the
    match-any union."""
    ub = F.broadcast(
        ts.groupBy("term")
        .agg(F.max("idf").alias("_idf"))
        .select("term", (F.col("_idf") * (k1 + 1.0)).alias("ub"))
    )
    t_star = F.broadcast(
        ub.orderBy(F.desc("ub"), F.asc("term"))
        .limit(1)
        .select(F.col("term").alias("t_star"))
    )
    seed_ids = (
        ts.join(t_star, ts["term"] == t_star["t_star"], "inner")
        .select("id")
        .distinct()
    )
    seed_topk = (
        ts.join(seed_ids, "id", "left_semi")
        .groupBy("id")
        .agg(F.sum("term_score").alias("s"))
        .orderBy(F.desc("s"), F.asc("id"))
        .limit(k)
    )
    theta = F.broadcast(
        seed_topk.agg(
            F.count("*").alias("_n"), F.min("s").alias("_min")
        ).select(
            F.when(F.col("_n") < k, F.lit(float("-inf")))
            .otherwise(F.col("_min") - 1e-6)
            .alias("theta")
        )
    )
    ub_sum = (
        ts.join(ub, "term")
        .groupBy("id")
        .agg(F.sum("ub").alias("ub_sum"))
    )
    return ub_sum.crossJoin(theta).where(F.col("ub_sum") >= F.col("theta"))


def maxscore_topk(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k with MaxScore dynamic pruning — EXACTLY the
    bm25_topk answer (same columns, same deterministic (score, id)
    order; the q160 oracle is the exhaustive scorer), but only docs
    whose optimistic impact bound clears the seeded threshold are ever
    exactly scored and sorted. See `maxscore_candidates` for the
    argument; the shared term-score stage is localCheckpoint'd (three
    consumers — seed, bound, final — must not recompute the scan)."""
    terms = normalize_query(query)
    if not terms:
        raise ValueError("query has no terms after normalization")
    ts = _term_scores(docs, terms, id_col, text_col, k1, b).localCheckpoint(
        eager=False
    )
    cands = maxscore_candidates(ts, k, k1).select("id")
    final = (
        ts.join(cands, "id", "left_semi")
        .groupBy("id")
        .agg(
            F.round(F.sum("term_score"), 6).alias("score"),
            F.count("*").alias("n_matched_terms"),
        )
    )
    return (
        final.orderBy(F.desc("score"), F.asc("id"))
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


def best_snippet(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 10,
) -> DataFrame:
    """KWIC snippet extraction — the display tier after retrieval: for
    every document matching any query term, the `width`-token window
    containing the MOST query-term matches (keyword-in-context).

    Deterministic argmax: the optimal window always starts AT a match
    (sliding further left cannot add matches), so candidate starts are
    exactly the match positions; ties break to the EARLIEST window.
    Term matching mirrors normalize_query (lowercase, alphanumerics
    only) applied per raw token, so snippets quote the ORIGINAL text
    while matching the normalized query — the same pairing a search UI
    needs. Returns (id, n_matches, snippet_start, snippet); documents
    with no match yield no rows.

    Scale shape: match positions and the per-candidate counts are
    per-document array expressions (matches per doc are few; the
    O(m^2) candidate scan is bounded) — pure map-side codegen, ZERO
    shuffle. The q179 oracle replays positions, counts, argmax and the
    original-token slice in SQL."""
    terms = normalize_query(query)
    if not terms:
        raise ValueError("query has no terms after normalization")
    if width < 1:
        raise ValueError("width must be >= 1")
    from horus_spark.operators.textstats import ws_tokens_expr

    toks = ws_tokens_expr(F.col(text_col))
    norm = "regexp_replace(lower(t), '[^a-z0-9]', '')"

    staged = docs.select(
        F.col(id_col).alias("id"), toks.alias("_t")
    ).select(
        "id",
        "_t",
        F.expr(
            f"""
            filter(
              transform(_t, (t, p) -> case when
                array_contains({_terms_sql(terms)}, {norm})
                then cast(p as int) else cast(-1 as int) end),
              p -> p >= 0)
            """
        ).alias("_mp"),
    )
    # window counts computed ONCE per candidate (lambdas get no CSE, so
    # a count inside the fold's CASE would run the m^2 scan twice)
    best = F.expr(
        f"""
        aggregate(
          transform(_mp, p -> named_struct(
            'cnt', size(filter(_mp, q -> q >= p and q < p + {width})),
            'st', p)),
          named_struct('cnt', cast(0 as int), 'st', cast(-1 as int)),
          (acc, x) -> case when x.cnt > acc.cnt then x else acc end)
        """
    )
    out = staged.where(F.size("_mp") > 0).select(
        "id", "_t", best.alias("_b")
    )
    return out.select(
        "id",
        F.col("_b.cnt").alias("n_matches"),
        F.col("_b.st").alias("snippet_start"),
        F.concat_ws(
            " ", F.expr(f"slice(_t, _b.st + 1, {width})")
        ).alias("snippet"),
    )


def _terms_sql(terms: list[str]) -> str:
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"array({inner})"
