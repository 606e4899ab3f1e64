"""Anchor-text aggregation per link destination.

The classic web signal: the text people LINK WITH describes the target
better than the target describes itself (search ranking, weak labels
for classifier training, alt-title mining). Given an outlink table
(extract_links output), aggregate per destination URL: how many links
point at it, from how many distinct source pages, and the top-k anchor
terms by frequency.

Scale shape: tokenization is a map-side explode; the (url, term)
count is one hash aggregation with map-side combine (the only
corpus-sized wire: one row per distinct (url, term) after combine);
the top-k cut is `topk.top_k_per_key` = row_number over a
url-partitioned window on the ALREADY-aggregated term counts, planned
with WindowGroupLimit map-side pruning; the per-url link/source counts
ride a second slim agg joined back on url. No payloads, no global
sort. URLs are aggregated as given — normalize upstream
(`urls.normalize_url_expr`) if link variants should collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import top_k_per_key


def anchor_stats(
    links: DataFrame,
    url_col: str = "resolved",
    anchor_col: str = "anchor_text",
    src_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per destination URL: (url, n_refs, n_sources, top_terms) where
    top_terms is the k most frequent lowercased anchor tokens (count
    DESC, term ASC — deterministic). Links with NULL destinations are
    dropped; links with empty anchors count toward n_refs/n_sources
    but contribute no terms."""
    base = links.where(F.col(url_col).isNotNull()).select(
        F.col(url_col).alias("url"),
        F.col(anchor_col).alias("anchor"),
        F.col(src_col).alias("src"),
    )
    totals = base.groupBy("url").agg(
        F.count("*").alias("n_refs"),
        F.countDistinct("src").alias("n_sources"),
    )
    terms = (
        base.select(
            "url",
            F.explode(
                F.split(F.lower(F.trim(F.col("anchor"))), r"\s+")
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("url", "term")
        .agg(F.count("*").alias("n"))
    )
    top = top_k_per_key(terms, ["url"], "n", k, tie_col="term")
    top_agg = top.groupBy("url").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("rank", "term"))),
            lambda s: s["term"],
        ).alias("top_terms")
    )
    return totals.join(top_agg, "url", "left").select(
        "url",
        "n_refs",
        "n_sources",
        F.coalesce(
            F.col("top_terms"), F.array().cast("array<string>")
        ).alias("top_terms"),
    )
