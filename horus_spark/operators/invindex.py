"""Positional inverted-index construction and phrase search.

Index construction is THE canonical big-data job (the original
MapReduce paper's running example), and a curation engine needs it for
more than search: phrase-level contamination checks ("does the corpus
quote this benchmark sentence verbatim?"), quote mining, and
concordance views all reduce to postings with positions.

`build_postings` is one shuffle: tokens explode map-side with their
in-document position, and groupBy(term, doc) collects each document's
position list (sort_array pins the order — collect_list alone is
partitioning-dependent). The posting row (term, id, positions, tf) is
the standard delta-encodable shape; at 100 TB the term key is the
shuffle key, so hot terms ride AQE skew splitting and stopword-class
terms can be pruned by a df cap before the explode if the index is
search-only.

`phrase_matches` answers an exact k-term phrase query from the index
alone: k slim semi-joined posting rows per document (the postings are
FILTERED to the phrase terms before any join — predicate pushdown to
the index scan), then consecutive-position intersection as a pure
array expression: a match at p needs term_j's postings to contain
p + j for every j. No re-tokenization, no corpus re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, id, positions: sorted array<int> of 0-based token
    offsets, tf). One hash shuffle on (term, id) with map-side
    partial aggregation."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda w: w != "",
            )
        ).alias("pos", "term"),
    )
    return toks.groupBy("term", "id").agg(
        F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias(
            "positions"
        ),
        F.count(F.lit(1)).alias("tf"),
    )


def phrase_matches(
    postings: DataFrame,
    phrase: list[str],
) -> DataFrame:
    """Documents containing the exact phrase (terms at consecutive
    positions): (id, n_matches, first_pos). The phrase is a driver
    constant (search-query-sized); duplicate terms in the phrase are
    handled (each occurrence joins the same posting row)."""
    if not phrase:
        raise ValueError("phrase must contain at least one term")
    legs = []
    for j, term in enumerate(phrase):
        legs.append(
            postings.where(F.col("term") == term).select(
                "id", F.col("positions").alias(f"_p{j}")
            )
        )
    joined = legs[0]
    for j in range(1, len(phrase)):
        joined = joined.join(legs[j], "id")
    out = joined.withColumn(
        "_m",
        F.filter(
            F.col("_p0"),
            lambda p: _consecutive(p, len(phrase)),
        )
        if len(phrase) > 1
        else F.col("_p0"),
    )
    return (
        out.where(F.size("_m") > 0)
        .select(
            "id",
            F.size("_m").alias("n_matches"),
            F.element_at("_m", 1).alias("first_pos"),
        )
    )


def _consecutive(p, k: int):
    cond = None
    for j in range(1, k):
        c = F.array_contains(F.col(f"_p{j}"), p + j)
        cond = c if cond is None else (cond & c)
    return cond
