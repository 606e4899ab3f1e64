"""Crawl-frontier construction (operators/frontier.py, oracle q113)."""

from pyspark.sql import functions as F

from horus_spark.operators.frontier import frontier_update
from horus_spark.operators.robots import parse_robots


def _outlinks(spark):
    rows = [
        ("p1", "https://a.test/x#frag"),     # fragment normalized away
        ("p2", "https://a.test/x"),          # same URL -> indegree 2
        ("p2", "https://a.test/x"),          # same source counted once
        ("p1", "https://a.test/y/"),         # trailing slash stripped
        ("p1", "https://a.test/private/z"),  # robots-blocked
        ("p2", "https://a.test/seenpage"),   # already crawled
        ("p1", None),                        # unresolvable (mailto etc.)
        ("p1", "ftp://a.test/file"),         # non-http scheme
        ("p2", "https://b.test/1"),
        ("p2", "https://b.test/2"),
    ]
    return spark.createDataFrame(rows, "doc_id string, resolved string")


def _rules(spark):
    df = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /private")],
        "domain string, robots_txt string",
    )
    return parse_robots(df, agent="horusbot")


def test_frontier_full_pipeline(spark):
    seen = spark.createDataFrame(
        [("https://a.test/seenpage/",)], "url string"  # normalized match
    )
    out = frontier_update(
        _outlinks(spark), seen, rules=_rules(spark), per_host_budget=1
    )
    got = {(r.host, r.url, r.indegree) for r in out.collect()}
    # a.test: /x (indegree 2) beats /y (1); /private/z robots-dropped;
    # seenpage anti-joined. b.test: tie on indegree -> url asc picks /1.
    assert got == {
        ("a.test", "https://a.test/x", 2),
        ("b.test", "https://b.test/1", 1),
    }


def test_frontier_no_rules_no_budget(spark):
    seen = spark.createDataFrame([("https://nowhere.test/",)], "url string")
    out = frontier_update(_outlinks(spark), seen)
    got = {r.url: r.indegree for r in out.collect()}
    assert got == {
        "https://a.test/x": 2,
        "https://a.test/y": 1,
        "https://a.test/private/z": 1,  # no rules -> kept
        "https://a.test/seenpage": 1,   # not in seen -> kept
        "https://b.test/1": 1,
        "https://b.test/2": 1,
    }
    assert out.columns == ["host", "url", "indegree"]


def test_budget_prefers_indegree_then_url(spark):
    rows = [(f"p{i}", "https://c.test/popular") for i in range(3)] + [
        ("p0", "https://c.test/aaa"),
        ("p0", "https://c.test/bbb"),
    ]
    links = spark.createDataFrame(rows, "doc_id string, resolved string")
    seen = spark.createDataFrame([("https://x.test/",)], "url string")
    out = frontier_update(links, seen, per_host_budget=2)
    got = [(r.url, r.indegree) for r in
           out.orderBy(F.desc("indegree"), "url").collect()]
    assert got == [("https://c.test/popular", 3), ("https://c.test/aaa", 1)]
