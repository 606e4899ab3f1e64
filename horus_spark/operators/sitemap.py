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
