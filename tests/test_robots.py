"""robots.txt crawl-policy evaluation (operators/robots.py, oracle q111).

RFC 9309 longest-match core: group applicability (wildcard + named
agent, case-insensitive), empty-Disallow no-op, longest-prefix wins,
Allow wins equal-length ties, no-match and no-rules default to allowed.
"""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.robots import apply_robots, parse_robots


ROBOTS = """\
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:

User-Agent: HorusBot
Allow: /tmp
Disallow: /tmp

User-agent: badbot
Disallow: /
"""


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame(
        [("a.test", ROBOTS), ("empty.test", "")],
        "domain string, robots_txt string",
    )
    return parse_robots(df, agent="horusbot").cache()


def test_parse_rule_rows(rules):
    rows = {
        (r.domain, r.rule, r.prefix, r.prefix_len)
        for r in rules.collect()
    }
    # badbot group dropped (agent mismatch); empty Disallow dropped
    # (no-op by RFC); the mixed-case HorusBot group kept.
    assert rows == {
        ("a.test", "disallow", "/private", 8),
        ("a.test", "allow", "/private/ok", 11),
        ("a.test", "allow", "/tmp", 4),
        ("a.test", "disallow", "/tmp", 4),
    }


def _verdicts(spark, rules, urls):
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        r.url: (r.path, r.allowed)
        for r in apply_robots(pages, rules).collect()
    }


def test_longest_match_and_ties(spark, rules):
    v = _verdicts(
        spark,
        rules,
        [
            "https://a.test/doc/1",          # no rule matches -> allowed
            "https://a.test/private/x",      # Disallow /private
            "https://a.test/private/ok/x",   # longer Allow wins
            "https://a.test/tmp/x",          # equal length -> Allow wins
            "https://a.test",                # bare host -> path '/'
            "https://nobody.test/private/x", # domain with no robots
            "https://empty.test/private/x",  # robots present but no rules
        ],
    )
    assert v["https://a.test/doc/1"] == ("/doc/1", 1)
    assert v["https://a.test/private/x"] == ("/private/x", 0)
    assert v["https://a.test/private/ok/x"] == ("/private/ok/x", 1)
    assert v["https://a.test/tmp/x"] == ("/tmp/x", 1)
    assert v["https://a.test"] == ("/", 1)
    assert v["https://nobody.test/private/x"] == ("/private/x", 1)
    assert v["https://empty.test/private/x"] == ("/private/x", 1)


def test_catch_all_disallow_for_named_agent(spark):
    df = spark.createDataFrame(
        [("b.test", "User-agent: badbot\nDisallow: /")],
        "domain string, robots_txt string",
    )
    bad = parse_robots(df, agent="badbot")
    v = _verdicts(spark, bad, ["https://b.test/anything", "https://b.test"])
    assert v["https://b.test/anything"] == ("/anything", 0)
    assert v["https://b.test"] == ("/", 0)


def test_parse_is_map_side(spark, rules):
    plan = rules._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_robots_audit(spark):
    from horus_spark.operators.robots import parse_robots, robots_audit

    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /private\nAllow: /private/ok")],
        "domain string, robots_txt string",
    )
    crawled = spark.createDataFrame(
        [
            ("https://a.test/p/1",),
            ("https://a.test/private/x1",),   # violation
            ("https://a.test/private/ok2",),  # allow wins the tie-length
            ("https://b.test/private/x1",),   # no policy -> legal
        ],
        "url string",
    )
    got = {
        r.domain: (r.n_crawled, r.n_violations, r.violation_ppm)
        for r in robots_audit(crawled, parse_robots(robots)).collect()
    }
    assert got["a.test"] == (3, 1, 333333)
    assert got["b.test"] == (1, 0, 0)


def test_sitemap_urls_directives(spark):
    from horus_spark.operators.robots import sitemap_urls

    txt = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.test/s1.xml\n"
        "sitemap:https://a.test/s2.xml  \n"
        "NotASitemap: https://no\n"
        " SITEMAP : https://a.test/s3.xml\n"
        "Crawl-delay: 5"
    )
    df = spark.createDataFrame(
        [("a.test", txt), ("b.test", "User-agent: *\nAllow: /")],
        "domain string, robots_txt string",
    )
    rows = [tuple(r) for r in sitemap_urls(df).orderBy("domain", "pos").collect()]
    assert rows == [
        ("a.test", 0, "https://a.test/s1.xml"),
        ("a.test", 1, "https://a.test/s2.xml"),
        ("a.test", 2, "https://a.test/s3.xml"),
    ]
    plan = sitemap_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
