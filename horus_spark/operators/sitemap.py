"""Sitemap parsing (sitemaps.org protocol): urlset + sitemapindex.

The discovery complement to robots/frontier: sitemaps seed the crawl
frontier with the site's own declared URL inventory and freshness
hints. `parse_sitemaps` turns raw sitemap XML bodies into typed entry
rows — both `<urlset>` documents (one row per `<url>`: loc, lastmod,
changefreq, priority) and `<sitemapindex>` documents (one row per
child `<sitemap>`: loc, lastmod) — with the entry's document-order
position preserved.

Parsing is tolerant by regex (the protocol's fields are flat,
order-free tags inside the entry block; namespace attributes and
whitespace tolerated; entries without the required `<loc>` are
dropped). `priority` is emitted as integer parts-per-million
(round(x * 1e6)) — engine-portable; the raw decimal string never
leaves the parser as a float column.

Scale shape: pure map-side expressions (regexp_extract_all +
posexplode + per-field regexes) — zero shuffle, scan-parallel over any
number of sitemap bodies. XML entities and CDATA sections are out of
scope (documented; protocol-generated sitemaps escape into plain
text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENTRY_RE = r"(?is)<(?:url|sitemap)\b[^>]*>.*?</(?:url|sitemap)>"


def _field(block, tag: str):
    # attrs only after whitespace: '<loc ...>' or '<loc>', never a
    # longer tag name that merely starts with the field name
    return F.nullif(
        F.regexp_extract(
            block, rf"(?is)<{tag}(?:\s[^>]*)?>\s*(.*?)\s*</{tag}>", 1
        ),
        F.lit(""),
    )


def parse_sitemaps(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    id_col: str = "src",
) -> DataFrame:
    """Sitemap bodies -> typed entry rows: (src, entry_pos, kind, loc,
    lastmod, changefreq, priority_ppm) with kind in {'url','sitemap'}.
    Entries missing <loc> are dropped (required by the protocol);
    absent optional fields are NULL. Zero shuffle."""
    exploded = df.select(
        F.col(id_col).alias("src"),
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ENTRY_RE), 0)
        ).alias("entry_pos", "block"),
    )
    b = F.col("block")
    kind = F.when(
        F.lower(b).startswith("<sitemap"), F.lit("sitemap")
    ).otherwise(F.lit("url"))
    prio = _field(b, "priority")
    out = exploded.select(
        "src",
        F.col("entry_pos").cast("int").alias("entry_pos"),
        kind.alias("kind"),
        _field(b, "loc").alias("loc"),
        _field(b, "lastmod").alias("lastmod"),
        _field(b, "changefreq").alias("changefreq"),
        F.round(prio.cast("double") * 1_000_000)
        .cast("int")
        .alias("priority_ppm"),
    )
    return out.where(F.col("loc").isNotNull())


def sitemap_coverage(
    listed: DataFrame,
    crawled: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Sitemap-vs-crawl coverage audit — the crawl-ops report joining
    the two URL inventories a host exposes: what the site DECLARES
    (parse_sitemaps output) versus what the crawler actually HOLDS
    (frontier/seen set). Two numbers matter operationally:
    coverage_ppm (declared URLs we hold — low means the crawler is
    missing announced content, check robots/budget/traps) and
    discovery_ppm (held URLs the site never declared — high means
    deep-link discovery is doing the work and the sitemap is stale).

    Both inputs are deduplicated on (host, url); pass both sides
    through the same URL normalization (urls.normalize_url_expr)
    upstream or fragment/trailing-slash variants will read as
    disagreement. One full-outer join on slim (host, url) pairs + a
    per-host counter rollup; all ratios exact integer ppm. Returns
    (host, n_listed, n_crawled, n_both, listed_not_crawled,
    crawled_not_listed, coverage_ppm, discovery_ppm)."""
    l = (
        listed.select(
            F.col(host_col).alias("host"), F.col(url_col).alias("url")
        )
        .distinct()
        .withColumn("_l", F.lit(1))
    )
    c = (
        crawled.select(
            F.col(host_col).alias("host"), F.col(url_col).alias("url")
        )
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    j = l.join(c, ["host", "url"], "full_outer")
    agg = j.groupBy("host").agg(
        F.sum(F.coalesce("_l", F.lit(0))).cast("long").alias("n_listed"),
        F.sum(F.coalesce("_c", F.lit(0))).cast("long").alias("n_crawled"),
        F.sum(
            (F.col("_l").isNotNull() & F.col("_c").isNotNull()).cast("long")
        ).alias("n_both"),
    )
    return agg.select(
        "host",
        "n_listed",
        "n_crawled",
        F.col("n_both").cast("long").alias("n_both"),
        (F.col("n_listed") - F.col("n_both")).alias("listed_not_crawled"),
        (F.col("n_crawled") - F.col("n_both")).alias("crawled_not_listed"),
        F.expr(
            "CAST(n_both * 1000000 div greatest(n_listed, 1) AS BIGINT)"
        ).alias("coverage_ppm"),
        F.expr(
            "CAST((n_crawled - n_both) * 1000000"
            " div greatest(n_crawled, 1) AS BIGINT)"
        ).alias("discovery_ppm"),
    )
