"""Sitemap-protocol parsing (operators/sitemap.py, oracle q114)."""

from horus_spark.operators.sitemap import parse_sitemaps

URLSET = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc> https://a.test/1 </loc><lastmod>2026-01-02</lastmod>"
    "<changefreq>daily</changefreq><priority>0.3</priority></url>"
    "<url><loc>https://a.test/2</loc></url>"
    "<url><priority>0.9</priority></url>"  # no loc -> dropped
    "<URL><LOC>https://a.test/3</LOC></URL>"  # case-tolerant
    # a tag that merely STARTS with a field name must not leak into it
    "<url><locations>bogus</locations><loc>https://a.test/4</loc></url>"
    "</urlset>"
)
INDEX = (
    "<sitemapindex>"
    "<sitemap><loc>https://a.test/s1.xml</loc>"
    "<lastmod>2026-02-03</lastmod></sitemap>"
    "<sitemap><loc>https://a.test/s2.xml</loc></sitemap>"
    "</sitemapindex>"
)


def _parse(spark, xml):
    df = spark.createDataFrame(
        [("s", xml)], "src string, sitemap_xml string"
    )
    return parse_sitemaps(df)


def test_urlset_entries(spark):
    rows = {r.entry_pos: r for r in _parse(spark, URLSET).collect()}
    # entry 2 (no loc) dropped but positions stay document-order stable
    assert sorted(rows) == [0, 1, 3, 4]
    assert rows[4].loc == "https://a.test/4"  # <locations> did not leak
    r0 = rows[0]
    assert (r0.kind, r0.loc, r0.lastmod, r0.changefreq, r0.priority_ppm) == (
        "url", "https://a.test/1", "2026-01-02", "daily", 300_000
    )
    r1 = rows[1]
    assert (r1.loc, r1.lastmod, r1.changefreq, r1.priority_ppm) == (
        "https://a.test/2", None, None, None
    )
    assert rows[3].loc == "https://a.test/3"


def test_sitemapindex_entries(spark):
    rows = {r.entry_pos: r for r in _parse(spark, INDEX).collect()}
    assert {r.kind for r in rows.values()} == {"sitemap"}
    assert rows[0].loc == "https://a.test/s1.xml"
    assert rows[0].lastmod == "2026-02-03"
    assert rows[1].lastmod is None


def test_parse_is_map_side(spark):
    plan = (
        _parse(spark, URLSET)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_sitemap_coverage(spark):
    from horus_spark.operators.sitemap import sitemap_coverage

    listed = spark.createDataFrame(
        [
            ("a", "u1"), ("a", "u2"), ("a", "u3"), ("a", "u3"),  # dup row
            ("b", "v1"),
            ("c", "w1"),  # host with no crawl at all
        ],
        "host string, url string",
    )
    crawled = spark.createDataFrame(
        [
            ("a", "u1"), ("a", "u2"), ("a", "x9"),  # x9 undeclared
            ("b", "v1"),
            ("d", "z1"),  # crawled host with no sitemap
        ],
        "host string, url string",
    )
    got = {
        r.host: (
            r.n_listed, r.n_crawled, r.n_both, r.listed_not_crawled,
            r.crawled_not_listed, r.coverage_ppm, r.discovery_ppm,
        )
        for r in sitemap_coverage(listed, crawled).collect()
    }
    assert got["a"] == (3, 3, 2, 1, 1, 666666, 333333)
    assert got["b"] == (1, 1, 1, 0, 0, 1_000_000, 0)
    assert got["c"] == (1, 0, 0, 1, 0, 0, 0)
    assert got["d"] == (0, 1, 0, 0, 1, 0, 1_000_000)
