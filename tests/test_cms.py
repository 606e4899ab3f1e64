"""Count-min sketch: the one-sided overestimate guarantee, exactness
without collisions, additivity (partitioning invariance), weighted
counting, and absent-key probes."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.sketches import cms_estimate, cms_sketch


@pytest.fixture(scope="module")
def stream(spark):
    # skewed occurrence stream: tok0 x 50, tok1 x 20, tok2..tok11 x 3
    rows = [("tok0",)] * 50 + [("tok1",)] * 20
    for i in range(2, 12):
        rows += [(f"tok{i}",)] * 3
    return spark.createDataFrame(rows, "v string")


def _exact(stream):
    return {
        r.v: r.c
        for r in stream.groupBy("v").agg(F.count("*").alias("c")).collect()
    }


def test_never_underestimates_and_exact_when_wide(spark, stream):
    exact = _exact(stream)
    keys = stream.select(F.col("v").alias("key")).distinct()
    # tiny width -> collisions certain; estimate must still dominate
    sk = cms_sketch(stream, "v", d=2, w=4)
    est = {r.key: r.est for r in cms_estimate(sk, keys, d=2, w=4).collect()}
    assert all(est[k] >= exact[k] for k in exact)
    # wide sketch, 12 keys in 4x1024 cells -> no collisions -> exact
    sk2 = cms_sketch(stream, "v", d=4, w=1024)
    est2 = {r.key: r.est for r in cms_estimate(sk2, keys).collect()}
    assert est2 == exact


def test_sketch_is_additive_and_partitioning_invariant(spark, stream):
    whole = {
        (r.row_i, r.col_j): r.c
        for r in cms_sketch(stream, "v", d=3, w=8).collect()
    }
    # sketch two disjoint halves separately and sum the cells
    h1 = cms_sketch(stream.filter(F.col("v") < "tok3"), "v", d=3, w=8)
    h2 = cms_sketch(stream.filter(F.col("v") >= "tok3"), "v", d=3, w=8)
    merged = {}
    for r in h1.unionAll(h2).collect():
        merged[(r.row_i, r.col_j)] = merged.get((r.row_i, r.col_j), 0) + r.c
    assert merged == whole
    # and a different partitioning of the same rows changes nothing
    rep = {
        (r.row_i, r.col_j): r.c
        for r in cms_sketch(stream.repartition(7), "v", d=3, w=8).collect()
    }
    assert rep == whole


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "v string, wt int"
    )
    sk = cms_sketch(df, "v", d=4, w=64, weight_col="wt")
    keys = spark.createDataFrame([("a",), ("b",)], "key string")
    est = {r.key: r.est for r in cms_estimate(sk, keys, d=4, w=64).collect()}
    assert est == {"a": 12, "b": 1}


def test_absent_key_and_nulls(spark, stream):
    sk = cms_sketch(stream, "v", d=4, w=1024)
    keys = spark.createDataFrame([("never-seen",), (None,)], "key string")
    got = cms_estimate(sk, keys).collect()
    # null key dropped; absent key hits >= 1 empty cell at this width
    assert [(r.key, r.est) for r in got] == [("never-seen", 0)]


def test_param_validation(spark, stream):
    with pytest.raises(ValueError):
        cms_sketch(stream, "v", d=0, w=8)
    with pytest.raises(ValueError):
        cms_sketch(stream, "v", d=2, w=1)
