"""Host mirror detection + recrawl delta (oracles q118/q119)."""

import pytest

from horus_spark.operators.mirrors import host_mirror_pairs
from horus_spark.operators.recrawl import crawl_delta, host_change_rates


def test_mirror_pairs(spark):
    rows = (
        [("orig.test", f"d{i}") for i in range(10)]
        + [("copy.test", f"d{i}") for i in range(8)]   # 8/10 of orig
        + [("copy.test", "own1")]                       # + own content
        + [("other.test", "d0"), ("other.test", "e1"), ("other.test", "e2")]
        + [("orig.test", "d3")]                         # duplicate row -> distinct
    )
    df = spark.createDataFrame(rows, "host string, digest string")
    out = {
        (r.host_a, r.host_b): r
        for r in host_mirror_pairs(
            df, min_shared=2, min_containment_ppm=800_000
        ).collect()
    }
    # copy.test: 9 distinct digests, 8 shared with orig -> 888888 ppm
    r = out[("copy.test", "orig.test")]
    assert (r.shared, r.size_a, r.size_b) == (8, 9, 10)
    assert (r.containment_a_ppm, r.containment_b_ppm) == (888_888, 800_000)
    # other.test shares only d0 with orig (1 < min_shared) -> absent
    assert len(out) == 1


def test_mirror_hot_digest_prune(spark):
    # 'chrome' digest on 30 hosts would create ~435 pairs; pruned at 20.
    rows = [(f"h{i}.test", "chrome") for i in range(30)] + [
        ("h0.test", "a"), ("h1.test", "a"),
        ("h0.test", "b"), ("h1.test", "b"),
    ]
    df = spark.createDataFrame(rows, "host string, digest string")
    out = host_mirror_pairs(
        df, min_shared=2, min_containment_ppm=500_000,
        max_hosts_per_digest=20,
    ).collect()
    # only h0/h1 survive: 2 shared real digests of their 3-digest sets
    assert len(out) == 1
    r = out[0]
    assert (r.host_a, r.host_b, r.shared) == ("h0.test", "h1.test", 2)
    assert r.containment_a_ppm == 666_666


def test_mirror_guards(spark):
    df = spark.createDataFrame([("h", "d")], "host string, digest string")
    with pytest.raises(ValueError):
        host_mirror_pairs(df, min_containment_ppm=0)
    with pytest.raises(ValueError):
        host_mirror_pairs(df, min_shared=0)


def test_crawl_delta_and_rates(spark):
    prev = spark.createDataFrame(
        [
            ("https://a.test/1", "x1"),
            ("https://a.test/2", "x2"),
            ("https://a.test/3", "x3"),
            ("https://b.test/1", "y1"),
        ],
        "url string, digest string",
    )
    curr = spark.createDataFrame(
        [
            ("https://a.test/1", "x1"),   # unchanged
            ("https://a.test/2", "MOD"),  # modified
            # /3 gone
            ("https://a.test/4", "x4"),   # new
            # b.test current wave empty -> change_ppm 0
        ],
        "url string, digest string",
    )
    delta = {r.url: r.status for r in crawl_delta(prev, curr).collect()}
    assert delta == {
        "https://a.test/1": "unchanged",
        "https://a.test/2": "modified",
        "https://a.test/3": "gone",
        "https://a.test/4": "new",
        "https://b.test/1": "gone",
    }
    rates = {
        r.host: (r.n_new, r.n_gone, r.n_modified, r.n_unchanged,
                 r.change_ppm)
        for r in host_change_rates(crawl_delta(prev, curr)).collect()
    }
    assert rates["a.test"] == (1, 1, 1, 1, 666_666)
    assert rates["b.test"] == (0, 1, 0, 0, 0)
