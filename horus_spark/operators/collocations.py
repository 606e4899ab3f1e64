"""Corpus-level PMI collocation mining (word2phrase / Mikolov et al.
2013 shape): find token pairs that co-occur far more than chance —
the survey step behind phrase vocabularies, tokenizer merge seeding,
and boilerplate-template discovery over a web corpus.

PMI(w1,w2) = ln( p(w1,w2) / (p(w1) p(w2)) ) with bigram probabilities
over the corpus bigram total N and unigram probabilities over the
token total T.

Shape at scale (the part that matters at 100 TB):
- bigram construction is a map-side zip of two array slices — no
  Python, no self-join;
- exactly two aggregation shuffles (bigram counts, unigram counts),
  both with map-side partial aggregation, keyed on the words
  themselves;
- `min_count` prunes the bigram table BEFORE any join — the heavy
  tail of hapax pairs (the vast majority of distinct bigrams) never
  reaches a shuffle;
- unigram counts attach via two hash joins on the pruned table;
  corpus totals ride in on a broadcast of a 1-row frame;
- the final top-k is orderBy+limit — planned as TakeOrdered
  (per-partition top-k, no global sort).

Engine parity: the PMI ratio is computed as ONE double expression with
pinned parenthesization and the result is snapped to integer
micro-nats (round(ln(...)*1e6)) — bit-identical between Spark and the
DuckDB oracle, no float-sum order sensitivity anywhere (all counts are
exact longs).

Reference parity: no analog in the reference engine (it has no corpus
statistics tier); extends the LLM-data-pipeline set next to
textstats.top_ngrams (q49), which ranks by raw frequency — PMI ranks
by ASSOCIATION, surfacing rare-but-glued pairs frequency misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k adjacent-token collocations by PMI.

    Returns (w1, w2, n_pair, n_w1, n_w2, pmi) — pmi rounded to 1e-6
    nats; ordered by pmi desc then (w1, w2) asc, deterministic under
    ties. Tokens are the package-wide whitespace split; documents with
    fewer than two tokens contribute unigrams only."""
    if min_count < 1 or top_k < 1:
        raise ValueError("min_count and top_k must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        toks.alias("t")
    )

    n = F.size(F.col("t"))
    bigrams = base.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, n - 1),
                F.slice(F.col("t"), 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    pair_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )

    unigrams = base.select(F.explode(F.col("t")).alias("w"))
    uni_counts = unigrams.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))

    # corpus totals: T tokens, N bigram positions = sum(max(n_doc-1, 0)).
    totals = base.select(
        F.sum(n).cast("double").alias("tot_t"),
        F.sum(F.greatest(n - 1, F.lit(0))).cast("double").alias("tot_n"),
    )

    joined = (
        pair_counts.join(
            uni_counts.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")),
            "w1",
        )
        .join(
            uni_counts.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
    )
    # ONE double ratio with pinned parenthesization, then micro-nat snap:
    # pmi = ln( ((n_pair * tot_t) * tot_t) / ((tot_n * n_w1) * n_w2) )
    ratio = (
        (F.col("n_pair").cast("double") * F.col("tot_t")) * F.col("tot_t")
    ) / ((F.col("tot_n") * F.col("n_w1").cast("double")) * F.col("n_w2").cast("double"))
    micro = F.round(F.log(ratio) * F.lit(1e6)).cast("long")

    return (
        joined.select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.col("n_w1").cast("long").alias("n_w1"),
            F.col("n_w2").cast("long").alias("n_w2"),
            (micro / F.lit(1e6)).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
    )
