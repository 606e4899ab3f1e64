"""Empirical-Bayes shrunk keep rates: exact integer replay, shrinkage
direction/magnitude, strength=0 degeneracy, partitioning invariance,
guard."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.priors import shrunk_keep_rate

# domains: big (100 docs, 30% keep), small-hot (2 docs, 100% keep),
# small-cold (2 docs, 0% keep)
ROWS = (
    [("big", i < 30) for i in range(100)]
    + [("hot", True), ("hot", True)]
    + [("cold", False), ("cold", False)]
)


def _py(rows, s):
    from collections import defaultdict

    n = defaultdict(int)
    k = defaultdict(int)
    for d, kp in rows:
        n[d] += 1
        k[d] += kp
    N, K = sum(n.values()), sum(k.values())
    out = {}
    for d in n:
        out[d] = (
            n[d],
            k[d],
            (k[d] * 1_000_000) // n[d],
            ((k[d] * N + s * K) * 1_000_000) // ((n[d] + s) * N),
        )
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "domain string, keep boolean")


def test_exact_integer_replay(spark, docs):
    got = {
        r.domain: (r.n_docs, r.n_keep, r.raw_ppm, r.shrunk_ppm)
        for r in shrunk_keep_rate(docs, strength=10).collect()
    }
    assert got == _py(ROWS, 10)


def test_shrinkage_direction(spark, docs):
    got = {
        r.domain: r
        for r in shrunk_keep_rate(docs, strength=10).collect()
    }
    global_ppm = (32 * 1_000_000) // 104
    # small domains pulled strongly toward the global rate
    assert got["hot"].raw_ppm == 1_000_000
    assert global_ppm < got["hot"].shrunk_ppm < 1_000_000
    assert got["cold"].raw_ppm == 0
    assert 0 < got["cold"].shrunk_ppm < global_ppm
    # the big domain barely moves
    assert abs(got["big"].shrunk_ppm - got["big"].raw_ppm) < abs(
        got["hot"].shrunk_ppm - got["hot"].raw_ppm
    )


def test_strength_zero_is_raw(spark, docs):
    for r in shrunk_keep_rate(docs, strength=0).collect():
        assert r.shrunk_ppm == r.raw_ppm


def test_partitioning_invariance_and_guard(spark, docs):
    a = sorted(map(tuple, shrunk_keep_rate(docs, strength=7).collect()))
    b = sorted(
        map(
            tuple,
            shrunk_keep_rate(docs.repartition(11), strength=7).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError):
        shrunk_keep_rate(docs, strength=-1)


def test_int01_keep_column(spark):
    df = spark.createDataFrame(
        [("d", 1), ("d", 0), ("e", 1)], "domain string, keep int"
    )
    got = {
        r.domain: r.n_keep for r in shrunk_keep_rate(df, strength=0).collect()
    }
    assert got == {"d": 1, "e": 1}


def test_percentile_normalize(spark):
    from horus_spark.operators.priors import percentile_normalize

    rows = [
        ("a", "g1", 10), ("b", "g1", 30), ("c", "g1", 20),
        ("d", "g1", 30),  # tie with b -> id breaks it
        ("e", "g2", 5),   # singleton -> 0
        ("f", "g3", None),  # NULL score dropped
        ("g", "g3", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, s long")
    got = {
        r["id"]: (r["group"], r["pct_ppm"])
        for r in percentile_normalize(df, "s", "source").collect()
    }
    # g1 order: a(10) < c(20) < b(30) < d(30 ; id b<d)
    assert got["a"] == ("g1", 0)
    assert got["c"] == ("g1", 1_000_000 // 3)
    assert got["b"] == ("g1", 2_000_000 // 3)
    assert got["d"] == ("g1", 1_000_000)
    assert got["e"] == ("g2", 0)
    assert got["g"] == ("g3", 0)
    assert "f" not in got
