"""HDR quantile sketch: python bucket/lower replay at extremes, error
bound round-trip, merge/partitioning invariance, quantile estimates
(exact tier + bounded tier), and guards."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.sketches import (
    _hdr_bucket_sql,
    _hdr_lower_sql,
    hdr_quantiles,
    hdr_sketch,
)

K = 4
M = 1 << K


def _bucket(v, k=K):
    m = 1 << k
    if v < m:
        return v
    e = v.bit_length() - 1
    return (e - k + 1) * m + ((v - (1 << e)) >> (e - k))


def _lower(b, k=K):
    m = 1 << k
    if b < 2 * m:
        return b
    e = b // m + k - 1
    return (1 << e) + ((b % m) << (e - k))


EXTREMES = [0, 1, M - 1, M, M + 1, 2 * M - 1, 2 * M, 255, 256, 257,
            (1 << 40) - 1, 1 << 40, (1 << 40) + 12345, (1 << 62) - 1,
            1 << 62, (1 << 63) - 1]


def test_bucket_and_lower_match_python_replay(spark):
    df = spark.createDataFrame([(v,) for v in EXTREMES], "v long")
    got = df.select(
        "v",
        F.expr(_hdr_bucket_sql("v", K)).alias("b"),
    ).withColumn("lo", F.expr(_hdr_lower_sql("b", K))).collect()
    for r in got:
        assert r.b == _bucket(r.v), r.v
        assert r.lo == _lower(r.b), r.v
        # round trip: the lower bound is <= v and within the error bound
        assert r.lo <= r.v
        if r.v >= M:
            assert r.v - r.lo < max(r.lo >> K, 1) + (r.lo >> K)


def test_sketch_merges_and_is_partitioning_invariant(spark):
    vals = [(i % 7, (i * i * 31) % 100_000) for i in range(500)]
    df = spark.createDataFrame(vals, "g int, v long")
    whole = {
        (r.g, r.bucket): r.c
        for r in hdr_sketch(df, "v", ["g"], k=K).collect()
    }
    h1 = hdr_sketch(df.filter("v < 300"), "v", ["g"], k=K)
    h2 = hdr_sketch(df.filter("v >= 300"), "v", ["g"], k=K)
    merged = (
        h1.unionAll(h2).groupBy("g", "bucket").agg(F.sum("c").alias("c"))
    )
    assert {
        (r.g, r.bucket): r.c for r in merged.collect()
    } == whole
    rep = {
        (r.g, r.bucket): r.c
        for r in hdr_sketch(df.repartition(9), "v", ["g"], k=K).collect()
    }
    assert rep == whole


def test_quantiles_exact_tier(spark):
    # all values < 2^K -> every bucket is exact -> quantiles are exact
    df = spark.createDataFrame([(v,) for v in range(M)], "v long")
    sk = hdr_sketch(df, "v", k=K)
    got = {
        r.q_ppm: (r.est, r.n)
        for r in hdr_quantiles(sk, [500_000, 1_000_000], k=K).collect()
    }
    # rank ceil(0.5*16)=8 -> 8th smallest = value 7; max = 15
    assert got[500_000] == (7, M)
    assert got[1_000_000] == (M - 1, M)


def test_quantiles_bounded_error(spark):
    vals = [((i * 2654435761) % 1_000_003) for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = hdr_sketch(df, "v", k=K)
    s = sorted(vals)
    got = {
        r.q_ppm: r.est
        for r in hdr_quantiles(
            sk, [100_000, 500_000, 900_000, 990_000], k=K
        ).collect()
    }
    for q, est in got.items():
        true = s[max((q * len(s) + 999_999) // 1_000_000, 1) - 1]
        assert est <= true
        assert true <= est + max(est >> K, 1)


def test_grouped_quantiles_and_guards(spark):
    df = spark.createDataFrame(
        [("a", v) for v in range(100)] + [("b", v * 10) for v in range(100)],
        "g string, v long",
    )
    sk = hdr_sketch(df, "v", ["g"], k=K)
    got = {
        (r.g, r.q_ppm): r.est
        for r in hdr_quantiles(sk, [500_000], ["g"], k=K).collect()
    }
    assert got[("a", 500_000)] <= 49
    assert got[("b", 500_000)] <= 490
    with pytest.raises(ValueError):
        hdr_sketch(df, "v", k=0)
    with pytest.raises(ValueError):
        hdr_quantiles(sk, [], k=K)
    with pytest.raises(ValueError):
        hdr_quantiles(sk, [0], k=K)


def test_negative_value_fails_lazily(spark):
    df = spark.createDataFrame([(5,), (-3,)], "v long")
    sk = hdr_sketch(df, "v", k=K)  # no job yet -> no error yet
    with pytest.raises(Exception, match="non-negative"):
        sk.collect()


def test_quantile_outlier_gate(spark):
    from horus_spark.operators.sketches import quantile_outlier_gate

    rows = [("g", v) for v in range(1, 101)] + [("g", 10_000)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = quantile_outlier_gate(df, "v", ["g"], q=990_000, k=K)
    out = {(r.g, r.v): (r.q_est, r.outlier) for r in got.collect()}
    # the one huge value must be flagged; small values must not be
    assert out[("g", 10_000)][1] is True
    assert all(not o for (g, v), (_, o) in out.items() if v <= 90)
    # ungrouped path
    un = quantile_outlier_gate(df, "v", None, q=500_000, k=K)
    assert un.filter("outlier").count() > 0
