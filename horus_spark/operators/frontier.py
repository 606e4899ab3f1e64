"""Crawl-frontier construction: this wave's outlinks -> the next wave.

The capstone of the crawl stack (extract_links -> urls -> robots ->
budget): given the links extracted from the pages just crawled, produce
the set of URLs to crawl next —

1. normalize destinations (`urls.normalize_url_expr`: fragment, default
   port, trailing slash) and drop nulls / non-http(s) schemes;
2. aggregate to one row per URL with its indegree (distinct source
   pages) — the classic frontier priority signal;
3. anti-join the `seen` set (already crawled or queued);
4. drop URLs the domain's robots policy disallows
   (`robots.apply_robots` over pre-parsed rules);
5. per-host budget: keep the top `per_host_budget` URLs per host by
   (indegree DESC, url ASC) — politeness + anti-spider-trap, planned as
   WindowGroupLimit so each map partition pre-prunes before the
   shuffle (`sampling.cap_per_key`).

Scale shape: normalization is map-side; the indegree agg shuffles slim
(url, src) pairs with map-side combine; the seen anti-join is a plain
equi-join on url (both sides slim); robots evaluation runs on the
already-aggregated URL table against a robots-sized rules frame (AQE
broadcasts it); the budget is WindowGroupLimit, no global sort.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import host_of_expr, normalize_url_expr


def frontier_update(
    outlinks: DataFrame,
    seen: DataFrame,
    rules: Optional[DataFrame] = None,
    per_host_budget: Optional[int] = None,
    url_col: str = "resolved",
    src_col: str = "doc_id",
    seen_url_col: str = "url",
) -> DataFrame:
    """Next crawl wave: (host, url, indegree), robots-allowed, unseen,
    at most per_host_budget per host (highest indegree first, url as
    the deterministic tie-break). `rules` is `parse_robots` output for
    the crawling agent; None skips the policy filter."""
    cand = (
        outlinks.where(F.col(url_col).isNotNull())
        .select(
            normalize_url_expr(F.col(url_col)).alias("url"),
            F.col(src_col).alias("src"),
        )
        .where(F.col("url").rlike(r"^(?i)https?://"))
    )
    agg = cand.groupBy("url").agg(
        F.countDistinct("src").alias("indegree")
    )
    seen_norm = seen.select(
        normalize_url_expr(F.col(seen_url_col)).alias("url")
    ).distinct()
    agg = agg.join(seen_norm, "url", "left_anti")
    if rules is not None:
        from .robots import apply_robots

        verdicts = apply_robots(agg.select("url"), rules)
        agg = agg.join(
            verdicts.where(F.col("allowed") == 1).select("url", "domain"),
            "url",
        )
        out = agg.select(
            F.col("domain").alias("host"), "url", "indegree"
        )
    else:
        out = agg.select(
            host_of_expr(F.col("url")).alias("host"), "url", "indegree"
        )
    if per_host_budget is not None:
        from .sampling import cap_per_key

        out = cap_per_key(
            out,
            ["host"],
            per_host_budget,
            [F.col("indegree").desc(), F.col("url").asc()],
        )
    return out
