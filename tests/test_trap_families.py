"""URL-family spider-trap detection (operators/urls.py, oracle q115)."""

from pyspark.sql import functions as F

from horus_spark.operators.urls import trap_families, url_family_expr

import pytest


def test_url_family_templating(spark):
    rows = [
        ("https://a.test/cal/2026/8/19?page=3#frag",),
        ("https://A.Test:8080/doc/17",),
        ("https://a.test/search?q=abc123&sid=deadbeef",),
        ("https://a.test/about",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [
        r.fam
        for r in df.select(
            url_family_expr(F.col("url")).alias("fam")
        ).collect()
    ]
    assert got == [
        "a.test/cal/N/N/N?page=V",   # digits -> N, query value -> V, fragment dropped
        "a.test/doc/N",              # host lowercased, port stripped
        "a.test/search?q=V&sid=V",   # values templated before digit pass
        "a.test/about",
    ]


def test_trap_rule(spark):
    # host a.test: 6 calendar URLs (one family), 3 doc URLs, 1 static,
    # plus a duplicate fetch of one calendar URL (distinct-URL dedup).
    rows = (
        [(f"https://a.test/cal/2026/1/{d}?page=1",) for d in range(1, 7)]
        + [("https://a.test/cal/2026/1/3?page=1",)]  # dup URL
        + [(f"https://a.test/doc/{i}",) for i in range(3)]
        + [("https://a.test/about",)]
        + [(f"https://b.test/doc/{i}",) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "url string")
    out = {
        (r.host, r.family): (r.n_urls, r.host_urls, r.is_trap)
        for r in trap_families(df, min_urls=5, min_frac_ppm=500_000).collect()
    }
    # a.test: 10 distinct URLs; cal family 6/10 >= 50% and >= 5 -> trap
    assert out[("a.test", "a.test/cal/N/N/N?page=V")] == (6, 10, 1)
    assert out[("a.test", "a.test/doc/N")] == (3, 10, 0)
    assert out[("a.test", "a.test/about")] == (1, 10, 0)
    # b.test: doc family is 100% of the host but only 4 URLs (< min 5)
    assert out[("b.test", "b.test/doc/N")] == (4, 4, 0)


def test_trap_guard(spark):
    df = spark.createDataFrame([("https://a.test/x",)], "url string")
    with pytest.raises(ValueError):
        trap_families(df, min_frac_ppm=0)
