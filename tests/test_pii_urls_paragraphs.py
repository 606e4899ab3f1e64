"""PII detection/redaction, URL/domain ops, duplicated-paragraph stats
(q54/q55/q56 units)."""

import pytest
from pyspark.sql import functions as F


def test_pii_stats_counts(spark):
    from horus_spark.operators.pii import pii_stats

    df = spark.createDataFrame(
        [
            ("d1", "mail me at a.b+c@test.org or x@y.co"),
            ("d2", "call +44 207-946-0958 and 1 555-0100"),
            ("d3", "server at 192.168.0.1 paid with 4111 1111 1111 1111"),
            ("d4", "no pii here at all"),
            ("d5", ""),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["n_email"], r["n_card"], r["n_phone"], r["n_ip"], r["n_pii"])
        for r in pii_stats(df).collect()
    }
    assert out["d1"] == (2, 0, 0, 0, 2)
    assert out["d2"][2] >= 1 and out["d2"][0] == 0
    assert out["d3"] == (0, 1, 0, 1, 2)
    assert out["d4"] == (0, 0, 0, 0, 0)
    assert out["d5"] == (0, 0, 0, 0, 0)


def test_redact_pii_rewrites_and_preserves(spark):
    from horus_spark.operators.pii import pii_stats, redact_pii

    df = spark.createDataFrame(
        [("d1", "email a@b.com ip 10.0.0.1 card 4111 1111 1111 1111 end", 7)],
        "doc_id string, text string, keep int",
    )
    [row] = redact_pii(df).collect()
    assert row["redacted"] == "email <EMAIL> ip <IP> card <CARD> end"
    assert row["keep"] == 7 and row["text"].startswith("email a@b.com")
    # redacted text must scan clean
    clean = redact_pii(df).select("doc_id", F.col("redacted").alias("text"))
    [c] = pii_stats(clean).collect()
    assert c["n_pii"] == 0


def test_pii_plan_is_map_side(spark):
    from horus_spark.operators.pii import pii_stats

    df = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    plan = pii_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_normalization_and_host(spark):
    from horus_spark.operators.urls import host_of_expr, normalize_url_expr, path_depth_expr

    df = spark.createDataFrame(
        [
            ("HTTPS://Ex.COM:443/A/b/#frag", "https://ex.com/A/b", "ex.com", 2),
            ("http://a.org:8080/x", "http://a.org:8080/x", "a.org", 1),
            ("https://plain.net/", "https://plain.net", "plain.net", 0),
            ("https://q.io/p?k=v#f", "https://q.io/p?k=v", "q.io", 1),
            ("no-scheme-text", "no-scheme-text", "", 0),
        ],
        "url string, exp_norm string, exp_host string, exp_depth int",
    )
    rows = df.select(
        "url", "exp_norm", "exp_host", "exp_depth",
        normalize_url_expr(F.col("url")).alias("norm"),
        host_of_expr(F.col("url")).alias("host"),
        path_depth_expr(F.col("url")).alias("depth"),
    ).collect()
    for r in rows:
        assert r["norm"] == r["exp_norm"], r["url"]
        assert r["host"] == r["exp_host"], r["url"]
        assert r["depth"] == r["exp_depth"], r["url"]


def test_domain_counts(spark):
    from horus_spark.operators.urls import domain_counts

    df = spark.createDataFrame(
        [
            ("d1", "https://a.com/x"),
            ("d2", "https://A.com/x/"),  # same normalized URL as d1
            ("d3", "https://a.com/y/z"),
            ("d4", "https://b.org"),
        ],
        "doc_id string, url string",
    )
    out = {r["domain"]: (r["n_docs"], r["n_urls"], r["avg_path_depth"])
           for r in domain_counts(df).collect()}
    assert out["a.com"] == (3, 2, round((1 + 1 + 2) / 3, 6))
    assert out["b.org"] == (1, 1, 0.0)


def test_duplicate_paragraph_stats(spark):
    from horus_spark.operators.paragraphs import duplicate_paragraph_stats

    shared = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [
            ("d1", f"{shared} one two three four"),
            ("d2", f"{shared} five six seven eight"),
            ("d3", "nine ten eleven twelve"),
            ("d4", ""),  # no chunks -> zero row survives
            # within-doc repetition only: NOT cross-doc duplicated
            ("d5", "rep rep rep rep rep rep rep rep"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_frac"])
        for r in duplicate_paragraph_stats(df, window=4).collect()
    }
    assert out["d1"] == (2, 1, 0.5)
    assert out["d2"] == (2, 1, 0.5)
    assert out["d3"] == (1, 0, 0.0)
    assert out["d4"] == (0, 0, 0.0)
    assert out["d5"] == (2, 0, 0.0)


def test_duplicate_paragraph_shuffle_carries_digests_only(spark):
    # the digest aggregation's exchange must not move chunk text
    from horus_spark.operators.paragraphs import duplicate_paragraph_stats

    df = spark.createDataFrame(
        [("d", "a b c d e f g h")], "doc_id string, text string"
    )
    plan = (
        duplicate_paragraph_stats(df, window=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "chunk_text" not in line


def test_canonicalize_url_rules(spark):
    from horus_spark.operators.urls import canonicalize_url_expr
    from pyspark.sql import functions as F

    cases = [
        # (raw, expected)
        ("https://EX.com:443/A/b/", "https://ex.com/A/b"),
        ("http://ex.com:80/x?b=2&a=1#frag", "http://ex.com/x?a=1&b=2"),
        ("https://ex.com/x?utm_source=t&utm_medium=m", "https://ex.com/x"),
        ("https://ex.com/x?a=1&&b=2", "https://ex.com/x?a=1&b=2"),
        ("https://ex.com/x?PHPSESSID=z&a=1", "https://ex.com/x?a=1"),
        # 'sid'/'ref' are content-bearing on real sites (forum thread
        # routing, content selectors) — NOT stripped by default
        ("https://ex.com/x?ref=abc", "https://ex.com/x?ref=abc"),
        ("https://forum.ex.com/t?sid=9&t=12", "https://forum.ex.com/t?sid=9&t=12"),
        ("https://ex.com/x?refresh=1", "https://ex.com/x?refresh=1"),
        # slash inside a query value survives; only the PATH slash strips
        ("https://ex.com/p/?a=x/", "https://ex.com/p?a=x/"),
        ("no-scheme/path?b=2&a=1", "no-scheme/path?a=1&b=2"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [
        r["c"]
        for r in df.select(
            canonicalize_url_expr(F.col("url")).alias("c")
        ).collect()
    ]
    assert got == [e for _, e in cases]


def test_canonicalize_url_session_optin(spark):
    from horus_spark.operators.urls import canonicalize_url_expr
    from pyspark.sql import functions as F

    cases = [
        ("https://ex.com/x?ref=abc&a=1", "https://ex.com/x?a=1"),
        ("https://forum.ex.com/t?sid=9&t=12", "https://forum.ex.com/t?t=12"),
        ("https://ex.com/x?sessionid=z", "https://ex.com/x"),
        # anchored: 'refresh'/'side' are not 'ref'/'sid'
        ("https://ex.com/x?refresh=1&side=l", "https://ex.com/x?refresh=1&side=l"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [
        r["c"]
        for r in df.select(
            canonicalize_url_expr(
                F.col("url"), strip_session_keys=True
            ).alias("c")
        ).collect()
    ]
    assert got == [e for _, e in cases]


def test_registered_domain_rules(spark):
    from pyspark.sql import functions as F

    from horus_spark.operators.urls import registered_domain_expr

    cases = [
        ("www.Sub.Example.CO.UK", "example.co.uk"),
        ("a.b.c.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("co.uk", "co.uk"),  # bare suffix passes through
        ("x.co.uk", "x.co.uk"),  # registrant directly under co.uk
        ("deep.chain.site.com.au", "site.com.au"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [
        r["d"]
        for r in df.select(
            registered_domain_expr(F.col("h")).alias("d")
        ).collect()
    ]
    assert got == [e for _, e in cases]


def test_citation_stats(spark):
    from horus_spark.operators.textstats import citation_stats

    txt = (
        "Results match prior work [1] and [23] but not [1234] or "
        "[notanum]. As argued (2019) and (123) by Smith et al. and "
        "met alia."
    )
    df = spark.createDataFrame(
        [("d1", txt), ("d2", "")], "doc_id string, text string"
    )
    rows = {r["id"]: r.asDict() for r in citation_stats(df).collect()}
    d1 = rows["d1"]
    assert d1["n_bracket_cites"] == 2  # [1234] and [notanum] rejected
    assert d1["n_paren_years"] == 1  # (123) rejected
    assert d1["n_etal"] == 1  # 'met alia' rejected by \b and literal
    assert d1["cite_rate_ppm"] == 4 * 1_000_000 // d1["n_tokens"]
    d2 = rows["d2"]
    assert d2["n_tokens"] == 0 and d2["cite_rate_ppm"] is None


def test_port_stripping_is_scheme_aware(spark):
    from pyspark.sql import functions as F

    from horus_spark.operators.urls import (
        canonicalize_url_expr,
        normalize_url_expr,
    )

    cases = [
        ("http://ex.com:80/x", "http://ex.com/x"),
        ("https://ex.com:443/x", "https://ex.com/x"),
        # NON-default ports survive: http-on-443 is a distinct endpoint
        ("http://ex.com:443/x", "http://ex.com:443/x"),
        ("https://ex.com:80/x", "https://ex.com:80/x"),
        ("https://ex.com:8080/x", "https://ex.com:8080/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    for expr in (normalize_url_expr, canonicalize_url_expr):
        got = [
            r["c"] for r in df.select(expr(F.col("url")).alias("c")).collect()
        ]
        assert got == [e for _, e in cases], expr.__name__


def test_rare_combinations(spark):
    import pytest

    from horus_spark.operators.pii import rare_combinations

    rows = (
        [("en", "web") for _ in range(6)]
        + [("en", "books") for _ in range(2)]
        + [(None, "web")]
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {
        (r["lang"], r["source"]): (r["n_rows"], r["risky"])
        for r in rare_combinations(df, ["lang", "source"], k=5).collect()
    }
    assert got[("en", "web")] == (6, False)
    assert got[("en", "books")] == (2, True)
    assert got[(None, "web")] == (1, True)  # NULL groups as itself
    with pytest.raises(ValueError):
        rare_combinations(df, [], k=5)
    with pytest.raises(ValueError):
        rare_combinations(df, ["lang"], k=1)
