"""robots.txt crawl-policy evaluation (RFC 9309 longest-match core).

A crawl pipeline at 10^12 pages must answer "may I keep/fetch this URL?"
for every page against its domain's robots policy. This module parses
robots.txt bodies into per-domain rule rows and evaluates URLs with the
REP longest-match semantics — everything pure Spark expressions plus one
broadcast-friendly rules join, oracle-replayable end to end (q111).

Semantics implemented (the RFC 9309 / Google REP core):
- groups are blank-line-separated; a group applies when any of its
  User-agent lines is '*' or equals the caller's agent
  (case-insensitive);
- Allow/Disallow values are path prefixes; empty values are no-op rules
  (an empty Disallow allows everything by matching nothing);
- the rule with the LONGEST matching prefix wins; at equal length Allow
  wins; a URL with no matching rule (or no rules at all for its domain)
  is allowed.

Deliberately out of scope (documented, not silently wrong): '*'
wildcards and '$' anchors inside rule paths (a Google extension beyond
the prefix core — rule paths here are treated as literal prefixes) and
Crawl-delay/Sitemap directives (non-normative).

Scale shape: parsing is map-side (split/regex/explode). Evaluation joins
pages to rules on domain — the rules table is robots-sized (tiny next
to the corpus; AQE broadcasts it), and the verdict is a per-URL argmax
computed as an integer priority max (2*prefix_len + is_allow), so the
aggregation is a plain map-side-combined max, engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGENT_RE = r"(?im)^User-agent:[ \t]*(\S+)"
_RULE_TYPE_RE = r"(?im)^(Allow|Disallow):[ \t]*\S*"
_RULE_PATH_RE = r"(?im)^(?:Allow|Disallow):[ \t]*(\S*)"


def parse_robots(
    df: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt bodies -> applicable rule rows for `agent`:
    (domain, rule, prefix, prefix_len) with rule in {'allow',
    'disallow'}. Groups that name neither '*' nor the agent are
    dropped; empty rule values are dropped (no-op by RFC). Pure
    map-side expressions."""
    groups = F.split(F.col(txt_col), r"\r?\n[ \t]*\r?\n")
    g = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(groups).alias("grp"),
    )
    agents = F.transform(
        F.regexp_extract_all(F.col("grp"), F.lit(_AGENT_RE), 1),
        lambda a: F.lower(a),
    )
    applies = F.array_contains(agents, "*") | F.array_contains(
        agents, agent.lower()
    )
    g = g.where(applies).select(
        "domain",
        F.regexp_extract_all(F.col("grp"), F.lit(_RULE_TYPE_RE), 1).alias(
            "types"
        ),
        F.regexp_extract_all(F.col("grp"), F.lit(_RULE_PATH_RE), 1).alias(
            "paths"
        ),
    )
    rules = g.select(
        "domain",
        F.posexplode(F.col("types")).alias("pos", "rtype"),
        F.col("paths"),
    ).select(
        "domain",
        F.lower(F.col("rtype")).alias("rule"),
        F.element_at(F.col("paths"), F.col("pos") + 1).alias("prefix"),
    )
    return rules.where(F.col("prefix") != "").withColumn(
        "prefix_len", F.length("prefix").cast("int")
    )


def apply_robots(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-URL crawl verdict against parsed rules: adds (domain, path,
    allowed int). Longest matching prefix wins, Allow wins length ties,
    no match -> allowed. One join on domain (rules side is tiny) + one
    integer-max aggregation."""
    from .urls import host_of_expr

    raw_path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    base = pages.select(
        F.col(url_col).alias("url"),
        host_of_expr(F.col(url_col)).alias("domain"),
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path).alias(
            "path"
        ),
    )
    r = rules.select(
        F.col("domain").alias("r_domain"),
        "rule",
        "prefix",
        "prefix_len",
    )
    joined = base.join(r, base["domain"] == r["r_domain"], "left")
    # integer priority: longest prefix dominates, allow wins ties
    prio = F.when(
        F.col("prefix").isNotNull()
        & F.col("path").startswith(F.col("prefix")),
        2 * F.col("prefix_len") + (F.col("rule") == "allow").cast("int"),
    )
    agg = joined.groupBy("url", "domain", "path").agg(
        F.max(prio).alias("best")
    )
    return agg.select(
        "url",
        "domain",
        "path",
        F.when(
            F.col("best").isNull() | (F.col("best") % 2 == 1), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("allowed"),
    )


def robots_audit(
    crawled: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Crawl-compliance report — the governance check a responsible
    crawler runs over its own fetch log: verdict every crawled URL
    against the robots policy (apply_robots: longest-match, Allow wins
    ties, no-match allowed) and roll violations up per domain. Nonzero
    violation_ppm means the fetcher raced a robots update, a frontier
    bypassed the policy filter, or a redirect landed somewhere
    disallowed — all three happen in real crawls, which is why the
    audit exists separately from the frontier's pre-filter (q113).

    One broadcast-sized rules join + a domain-keyed rollup; ratios are
    exact integer ppm. Returns (domain, n_crawled, n_violations,
    violation_ppm)."""
    v = apply_robots(crawled, rules, url_col=url_col)
    return v.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_crawled"),
        F.sum(1 - F.col("allowed")).cast("long").alias("n_violations"),
        F.expr(
            "CAST(sum(1 - allowed) * CAST(1000000 AS BIGINT)"
            " div count(1) AS BIGINT)"
        ).alias("violation_ppm"),
    )


def sitemap_urls(
    robots: DataFrame,
    txt_col: str = "robots_txt",
    domain_col: str = "domain",
) -> DataFrame:
    """`Sitemap:` directive extraction (RFC 9309 §2.3 / sitemaps.org
    cross-submission): robots.txt is where a host DECLARES its sitemap
    inventory, so the discovery loop is robots fetch -> sitemap_urls
    -> sitemap fetch -> parse_sitemaps -> frontier. One row per
    directive in file order: (domain, pos, sitemap_url). The directive
    is group-independent (lives outside user-agent groups), matching
    is case-insensitive with tolerant whitespace, and values are taken
    verbatim (absolute URLs per the spec — resolve relative ones
    upstream if a host misbehaves). Pure map-side expressions, zero
    shuffle."""
    urls = F.expr(
        f"regexp_extract_all({txt_col}, '(?im)^\\\\s*sitemap\\\\s*:"
        f"\\\\s*(\\\\S+)\\\\s*$', 1)"
    )
    return robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(urls).alias("pos", "sitemap_url"),
    ).select(
        "domain", F.col("pos").cast("int").alias("pos"), "sitemap_url"
    )
