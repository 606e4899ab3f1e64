"""RSS / Atom feed parsing: syndication entries -> typed rows.

The third discovery channel next to sitemaps (operators/sitemap.py) and
in-page outlinks (html.py:extract_links): feeds announce NEW content
with freshness metadata, so crawl scheduling reads them at a much
higher cadence than sitemaps. `parse_feeds` turns raw feed XML bodies
into one typed row per entry — both RSS 2.0 `<item>` blocks and Atom
`<entry>` blocks — preserving the entry's document-order position.

Field mapping (coalesced across the two dialects):

  - title:     <title> (inline markup stripped, whitespace collapsed)
  - link:      RSS <link>text</link>; Atom <link href="..."/> (the
               attribute form — rel="alternate" or rel-less links win
               over rel="self"/"enclosure"/"edit" chrome; among
               eligible links, first in document order; when NO link
               qualifies, fall back to the first link element so
               degenerate feeds still resolve)
  - guid:      RSS <guid>, Atom <id>
  - published: RSS <pubDate>, Atom <published> falling back to
               <updated> (kept as the raw string: feed date formats
               are RFC 822 vs RFC 3339; normalization is a downstream
               typed-parse concern)

Entries without a resolvable link are dropped (the row exists to feed
the frontier); their positions still count so surviving entry_pos
reflects true document order — same convention as parse_sitemaps'
required-loc drop.

Tolerances/limits (documented): tag matching is case-insensitive,
attribute-bearing, order-free inside the entry block; XML entities and
CDATA sections are out of scope (protocol generators escape into plain
text — the sitemap module's convention).

Scale shape: pure map-side expressions (regexp_extract_all +
posexplode + per-field regexes) — ZERO shuffle, scan-parallel over any
number of feed bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENTRY_RE = r"(?is)<(?:item|entry)\b[^>]*>.*?</(?:item|entry)>"
# every Atom-style <link .../> TAG (attribute form); href/rel are then
# read per-tag so attribute order inside the tag is fully free
_ATOM_LINK_TAG_RE = r"(?is)<link\b[^>]*>"
_HREF_VAL_RE = r"(?is)\bhref\s*=\s*[\"']([^\"']*)[\"']"
_REL_VAL_RE = r"(?is)\brel\s*=\s*[\"']([^\"']*)[\"']"
_TAG_RE = r"<[^>]*>"


def _field(block, tag: str):
    # attrs only after whitespace, so 'link' never matches 'linkfoo'
    return F.nullif(
        F.regexp_extract(
            block, rf"(?is)<{tag}(?:\s[^>]*)?>\s*(.*?)\s*</{tag}>", 1
        ),
        F.lit(""),
    )


def parse_feeds(
    df: DataFrame,
    xml_col: str = "feed_xml",
    id_col: str = "src",
) -> DataFrame:
    """Feed bodies -> typed entry rows: (src, entry_pos, kind, title,
    link, guid, published) with kind in {'rss','atom'}. Entries with no
    link are dropped; absent optional fields are NULL. Zero shuffle."""
    exploded = df.select(
        F.col(id_col).alias("src"),
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ENTRY_RE), 0)
        ).alias("entry_pos", "block"),
    )
    b = F.col("block")
    kind = F.when(
        F.lower(b).startswith("<item"), F.lit("rss")
    ).otherwise(F.lit("atom"))
    title = F.nullif(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.coalesce(_field(b, "title"), F.lit("")),
                    _TAG_RE,
                    " ",
                ),
                r"\s+",
                " ",
            )
        ),
        F.lit(""),
    )
    # Atom attribute-form links: rel="alternate" (or rel-less) links
    # are the entry's content URL; rel="self"/"enclosure"/"edit" are
    # feed chrome — an entry listing those FIRST must not feed the
    # wrong URL into the frontier/seen-set. Prefer the first eligible
    # link; fall back to the first link tag only when none qualifies.
    link_tags = F.regexp_extract_all(b, F.lit(_ATOM_LINK_TAG_RE), 0)
    alt_tags = F.filter(
        link_tags,
        lambda t: F.lower(
            F.coalesce(
                F.nullif(F.regexp_extract(t, _REL_VAL_RE, 1), F.lit("")),
                F.lit("alternate"),
            )
        ).isin("alternate", "alt"),
    )
    pick_tag = F.when(
        F.size(alt_tags) > 0, F.element_at(alt_tags, 1)
    ).when(F.size(link_tags) > 0, F.element_at(link_tags, 1))
    link = F.coalesce(
        F.nullif(F.regexp_extract(pick_tag, _HREF_VAL_RE, 1), F.lit("")),
        _field(b, "link"),
    )
    out = exploded.select(
        "src",
        F.col("entry_pos").cast("int").alias("entry_pos"),
        kind.alias("kind"),
        title.alias("title"),
        link.alias("link"),
        F.coalesce(_field(b, "guid"), _field(b, "id")).alias("guid"),
        F.coalesce(
            _field(b, "pubDate"),
            _field(b, "published"),
            _field(b, "updated"),
        ).alias("published"),
    )
    return out.where(F.col("link").isNotNull())
