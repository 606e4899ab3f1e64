"""Redirect-chain resolution over a crawl's redirect map.

A crawl accumulates a redirect map (301/302: src URL -> dst URL). Every
downstream system wants the TERMINAL URL — canonical ids for dedup, the
frontier's seen-set, anchor aggregation — and chains (a->b->c) and
cycles (a->b->a) are routine. `resolve_redirects` computes, for every
URL, the node reached after at most `max_hops` edges, the exact hop
count, and whether it terminated ('resolved': the final node has no
out-edge) or was cut by the cap ('cycle_or_long': a cycle, or a chain
longer than the cap — exactly the give-up rule real crawlers apply).

Algorithm: pointer doubling (path halving) over the FUNCTIONAL graph —
log2(max_hops) self-joins of the redirect map compose u -> reach(u, 2^r)
with exact step counts (composition stops adding once a terminal is
reached, so hops = min(max_hops, true chain length) bit-exactly), then
one join applies the composed map to the URL set. The map is
redirect-sized — dimension data next to the corpus — so the log-round
self-joins never touch corpus-scale rows; the final apply is one
equi-join on url.

The map must be functional (at most one out-edge per src); duplicate
src rows would make the walk nondeterministic. The caller dedupes
(crawlers keep the latest observed redirect); this module trusts the
contract and documents it rather than paying a corpus-scale validation
pass per call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    urls: DataFrame,
    edges: DataFrame,
    max_hops: int = 8,
    url_col: str = "url",
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """(url, final_url, hops, status) for every input URL. max_hops
    must be a power of two (pointer doubling halves the rounds while
    keeping hop counts exact)."""
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(
            f"max_hops must be a power of two >= 1, got {max_hops}"
        )
    m = edges.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("v"),
        F.lit(1).alias("steps"),
    )
    t = 1
    while t < max_hops:
        a, b = m.alias("a"), m.alias("b")
        m = a.join(b, F.col("a.v") == F.col("b.u"), "left").select(
            F.col("a.u").alias("u"),
            F.coalesce(F.col("b.v"), F.col("a.v")).alias("v"),
            (
                F.col("a.steps")
                + F.coalesce(F.col("b.steps"), F.lit(0))
            ).alias("steps"),
        )
        t *= 2
    out = urls.select(F.col(url_col).alias("url")).join(
        m, F.col("url") == F.col("u"), "left"
    )
    resolved = out.select(
        "url",
        F.coalesce(F.col("v"), F.col("url")).alias("final_url"),
        F.coalesce(F.col("steps"), F.lit(0)).alias("hops"),
    )
    heads = edges.select(
        F.col(src_col).alias("final_url"), F.lit(1).alias("_out")
    ).distinct()
    flagged = resolved.join(heads, "final_url", "left")
    return flagged.select(
        "url",
        "final_url",
        "hops",
        F.when(F.col("_out").isNotNull(), F.lit("cycle_or_long"))
        .otherwise(F.lit("resolved"))
        .alias("status"),
    )


def resolve_aliases(
    urls: DataFrame,
    redirect_edges: DataFrame,
    canonical_edges: DataFrame,
    max_hops: int = 8,
    url_col: str = "url",
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """URL alias resolution over BOTH alias channels a crawl sees —
    HTTP redirects (resolve_redirects' input) and in-page
    `rel=canonical` annotations (html.py:page_metadata's canonical
    column) — composed into one alias map and pointer-doubled to the
    final representative URL. Dedup, the seen set and anchor/mirror
    aggregation all want THIS map, not either channel alone: a page
    often 302s to a tracking variant whose canonical points back at
    the clean URL.

    Conflict rule (a URL may carry both channels): the HTTP redirect
    wins — the server's actual behavior beats the page's annotation —
    and within a channel duplicate src rows collapse to the smallest
    destination (deterministic). Self-edges are dropped (a
    self-canonical page is already its own representative). The merged
    map then resolves exactly like resolve_redirects (same cap/cycle
    verdicts). Returns (url, final_url, hops, status).

    Scale shape: the precedence pick is one slim (src, dst, priority)
    aggregation over the alias maps (tiny next to the corpus); the
    walk adds log2(max_hops) self-joins of that map; corpus URLs cross
    exactly one equi-join — the q117 contract unchanged."""
    r = redirect_edges.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("v"),
        F.lit(0).alias("prio"),
    )
    c = canonical_edges.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("v"),
        F.lit(1).alias("prio"),
    )
    merged = (
        r.unionByName(c)
        .where(F.col("u") != F.col("v"))
        .groupBy("u")
        .agg(F.min(F.struct("prio", "v")).alias("m"))
        .select(
            F.col("u").alias(src_col), F.col("m.v").alias(dst_col)
        )
    )
    return resolve_redirects(
        urls, merged, max_hops=max_hops, url_col=url_col,
        src_col=src_col, dst_col=dst_col,
    )
