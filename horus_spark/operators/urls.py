"""URL / domain operators for web-corpus curation: normalize URLs,
extract the host, and survey per-domain document mass — the inputs to
domain-level policy (per-domain contribution caps, blocklists, crawl
dedup by canonical URL).

All pure JVM regexp/string expressions — zero Python. `domain_counts`
is one hash aggregation whose shuffle carries (domain, count) pairs
after map-side combine; everything else is a map-side projection. The
per-domain cap itself is `sampling.cap_per_key` (compose: normalize ->
host_of -> cap_per_key(keys=[domain])).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _strip_default_port(scheme: Column, host: Column) -> Column:
    """Drop the port only when it IS the scheme's default — http://h:443
    and https://h:80 are non-default endpoints and must survive."""
    return (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )


def normalize_url_expr(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, strip fragment, strip
    trailing slash, drop the scheme's default port. Query strings are
    KEPT (they can be content-bearing); strip them upstream if policy
    says so."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    # lowercase scheme://host only (path stays case-sensitive)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    host = _strip_default_port(scheme, host)
    rest = F.regexp_replace(rest, r"/$", "")  # trailing slash
    return F.when(scheme == "", u).otherwise(F.concat(scheme, F.lit("://"), host, rest))


def host_of_expr(url: Column) -> Column:
    """Host part of a URL ('' when no scheme present)."""
    return F.lower(
        F.regexp_replace(
            F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
            r":[0-9]+$",
            "",
        )
    )


def path_depth_expr(url: Column) -> Column:
    """Number of non-empty path segments."""
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    trimmed = F.regexp_replace(F.regexp_replace(path, r"^/+", ""), r"/+$", "")
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, "/"))
    ).cast("long")


def domain_counts(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per domain: document count, distinct normalized URLs, mean path
    depth — the survey that drives per-domain caps and blocklists."""
    base = df.select(
        F.col(id_col),
        host_of_expr(F.col(url_col)).alias("domain"),
        normalize_url_expr(F.col(url_col)).alias("norm_url"),
        path_depth_expr(F.col(url_col)).alias("depth"),
    )
    return base.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("norm_url").alias("n_urls"),
        F.round(F.avg("depth"), 6).alias("avg_path_depth"),
    )


def url_family_expr(url: Column) -> Column:
    """Structural URL template ('family'): host + path+query with query
    values replaced by 'V' and digit runs by 'N' — e.g.
    https://a.test/cal/2026/8/19?page=3 -> a.test/cal/N/N/N?page=V.
    URLs minted by the same generator (calendars, pagination, session
    ids, faceted search) collapse to one family; a crawler that counts
    families instead of URLs sees the spider trap as ONE exploding row.
    Fragment dropped; pure map-side expressions."""
    pq = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    pq = F.regexp_replace(pq, r"=[^&#]*", "=V")
    pq = F.regexp_replace(pq, r"[0-9]+", "N")
    return F.concat(host_of_expr(url), pq)


def trap_families(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 5,
    min_frac_ppm: int = 500_000,
) -> DataFrame:
    """Spider-trap / URL-family survey: per (host, family) the distinct
    URL count, the host's total distinct URLs, and is_trap = family has
    >= min_urls URLs AND >= min_frac_ppm ppm of the host's URLs
    (integer arithmetic). A family hoarding most of a host's distinct
    URLs is a generator (calendar, facet, session), not content — the
    frontier should cap or drop it.

    Scale shape: family templating is map-side; the distinct + the two
    aggregations shuffle slim (host, family, url) triples with
    map-side combine; the host-total join is host-keyed (hosts are
    dimension-sized next to URLs — AQE broadcasts)."""
    if not (0 < min_frac_ppm <= 1_000_000):
        raise ValueError(
            f"min_frac_ppm must be in (0, 1000000], got {min_frac_ppm}"
        )
    u = F.col(url_col)
    base = df.select(
        host_of_expr(u).alias("host"),
        url_family_expr(u).alias("family"),
        u.alias("url"),
    ).distinct()
    fam = base.groupBy("host", "family").agg(
        F.count("*").alias("n_urls")
    )
    totals = base.groupBy("host").agg(F.count("*").alias("host_urls"))
    out = fam.join(totals, "host")
    return out.select(
        "host",
        "family",
        "n_urls",
        "host_urls",
        (
            (F.col("n_urls") >= min_urls)
            & (
                F.col("n_urls") * F.lit(1_000_000)
                >= F.lit(min_frac_ppm) * F.col("host_urls")
            )
        )
        .cast("int")
        .alias("is_trap"),
    )


# full-parameter canonicalization: tracking params that never identify
# content. The DEFAULT tier is unambiguous: ad-click/analytics ids plus
# the platform-named session cookies (phpsessid/jsessionid) that never
# select content. SHORT generic keys ('sid', 'ref', 'sessionid') are a
# separate OPT-IN tier — on real sites forum thread routing uses ?sid=
# and content selectors use ?ref=, so stripping them by default would
# collapse genuinely distinct pages into one canonical key and silently
# drop them from streaming seen-set discovery. Anchored full-match on
# the param's key.
_TRACKING_PARAM_RE = (
    r"(?i)^(utm_[^=]*|gclid|fbclid|msclkid|yclid|mc_eid|igshid"
    r"|phpsessid|jsessionid)(=.*)?$"
)
_SESSION_PARAM_RE = (
    r"(?i)^(utm_[^=]*|gclid|fbclid|msclkid|yclid|mc_eid|igshid"
    r"|phpsessid|jsessionid|sessionid|sid|ref)(=.*)?$"
)


def canonicalize_url_expr(
    url: Column, strip_session_keys: bool = False
) -> Column:
    """Aggressive-but-safe URL canonicalization for dedup/seen-set/
    frontier keys — `normalize_url_expr` plus full query-string
    normalization:

      1. fragment stripped;
      2. scheme+host lowercased, default ports dropped, trailing path
         slash stripped (the normalize_url_expr rules, applied to the
         query-free part so a slash inside a query value is never
         touched);
      3. tracking parameters removed (utm_*, gclid, fbclid,
         phpsessid, ... — the keys that never identify content);
         `strip_session_keys=True` additionally strips the ambiguous
         generic keys 'sid'/'ref'/'sessionid', which ARE
         content-bearing on some sites (forum ?sid= routing, ?ref=
         selectors) and are therefore NOT stripped by default;
      4. surviving parameters SORTED lexicographically (param order is
         not content-bearing; '?b=2&a=1' and '?a=1&b=2' are the same
         resource) and empty fragments from '&&' dropped;
      5. the '?' disappears entirely when nothing survives.

    The same rules a crawl dedup needs before (url, digest) keying —
    otherwise every utm-tagged share of a page looks like a distinct
    URL and recrawl/mirror/coverage stats all inflate. Pure
    expressions, zero shuffle, RE2-compatible (the q166 oracle replays
    every rule in SQL)."""
    u = F.regexp_replace(url, r"#.*$", "")
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    scheme = F.lower(
        F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = F.lower(
        F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    rest = F.regexp_extract(
        base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1
    )
    host = _strip_default_port(scheme, host)
    rest = F.regexp_replace(rest, r"/$", "")
    base_n = F.when(scheme == "", base).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )
    drop_re = (
        _SESSION_PARAM_RE if strip_session_keys else _TRACKING_PARAM_RE
    )
    kept = F.sort_array(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(drop_re),
        )
    )
    return F.when(
        F.size(kept) > 0,
        F.concat(base_n, F.lit("?"), F.concat_ws("&", kept)),
    ).otherwise(base_n)


# compact effective-TLD tier: the high-traffic multi-label public
# suffixes. The full PSL is a data file a deployment ships alongside;
# the RULE (longest matching suffix + one label) is what is implemented
# and tested here, and the list is parameterizable.
_DEFAULT_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.tr", "com.ar",
)


def registered_domain_expr(
    host: Column,
    multi_suffixes: tuple[str, ...] = _DEFAULT_MULTI_SUFFIXES,
) -> Column:
    """Registered (pay-level) domain of a hostname — the rollup key
    host-level stats actually want: 'a.cdn.example.co.uk' and
    'www.example.co.uk' are the same registrant, and treating every
    subdomain as a distinct 'site' skews mirror/coverage/priors
    tables. Public-suffix rule, two tiers:

      - last two labels form a known multi-label suffix (co.uk,
        com.au, ...): registered domain = last THREE labels;
      - otherwise: last TWO labels;
      - single-label hosts (localhost, intranet names) pass through.

    Case-insensitive; ports must be stripped upstream (host_of_expr
    does). Pure expressions, zero shuffle; the q169 oracle replays the
    same slicing in SQL."""
    h = F.lower(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2)
    )
    tail = F.when(
        last2.isin(*multi_suffixes) & (n >= 3), F.lit(3)
    ).otherwise(F.lit(2))
    return F.when(n <= 1, h).otherwise(
        F.concat_ws(".", F.slice(labels, F.greatest(n - tail + 1, F.lit(1)), 99))
    )
