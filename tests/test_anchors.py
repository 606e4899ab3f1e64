"""Anchor-text aggregation (operators/anchors.py, oracle q116)."""

from pyspark.sql import functions as F

from horus_spark.operators.anchors import anchor_stats


def test_anchor_stats(spark):
    rows = [
        ("p1", "https://t.test/x", "Great Article"),
        ("p2", "https://t.test/x", "great article indeed"),
        ("p2", "https://t.test/x", "the article"),   # same src twice
        ("p3", "https://t.test/x", ""),              # empty anchor
        ("p1", "https://t.test/y", "  Spaced   Out  "),
        ("p1", None, "dead link"),                   # NULL dst dropped
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, resolved string, anchor_text string"
    )
    out = {r.url: r for r in anchor_stats(df, k=2).collect()}
    x = out["https://t.test/x"]
    # 4 links from 3 distinct sources; 'article' x3 beats 'great' x2
    assert (x.n_refs, x.n_sources) == (4, 3)
    assert x.top_terms == ["article", "great"]
    y = out["https://t.test/y"]
    assert (y.n_refs, y.n_sources, y.top_terms) == (1, 1, ["out", "spaced"])
    assert None not in out


def test_empty_anchor_only_destination(spark):
    df = spark.createDataFrame(
        [("p1", "https://t.test/z", "   ")],
        "doc_id string, resolved string, anchor_text string",
    )
    r = anchor_stats(df).collect()[0]
    assert (r.n_refs, r.n_sources, r.top_terms) == (1, 1, [])


def test_tie_break_is_term_order(spark):
    df = spark.createDataFrame(
        [("p1", "https://t.test/w", "zeta alpha mid")],
        "doc_id string, resolved string, anchor_text string",
    )
    r = anchor_stats(df, k=2).collect()[0]
    assert r.top_terms == ["alpha", "mid"]  # all count 1 -> term asc
