"""hll_sketch/hll_estimate/hll_set_ops: refactor parity with
hll_distinct, max-merge exactness (union sketch == sketch of union),
inclusion-exclusion sanity on known overlaps, disjoint/identical
extremes, grouped and ungrouped paths."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_set_ops,
    hll_sketch,
)

P = 6


@pytest.fixture(scope="module")
def sets(spark):
    a = spark.createDataFrame(
        [(f"v{i}",) for i in range(200)], "v string"
    )
    b = spark.createDataFrame(
        [(f"v{i}",) for i in range(100, 400)], "v string"
    )
    return a, b


def test_estimate_of_sketch_equals_hll_distinct(spark, sets):
    a, _ = sets
    via_stages = hll_estimate(hll_sketch(a, [], "v", p=P), [], p=P).collect()[0]
    direct = hll_distinct(a, [], "v", p=P).collect()[0]
    assert (via_stages.n_registers_hit, via_stages.est_distinct) == (
        direct.n_registers_hit,
        direct.est_distinct,
    )


def test_union_merge_is_exact(spark, sets):
    a, b = sets
    sa, sb = hll_sketch(a, [], "v", p=P), hll_sketch(b, [], "v", p=P)
    merged = (
        sa.unionByName(sb)
        .groupBy("reg")
        .agg(F.max("rho_max").cast("int").alias("rho_max"))
    )
    direct = hll_sketch(a.unionByName(b), [], "v", p=P)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_set_ops_overlap(spark, sets):
    a, b = sets
    r = hll_set_ops(
        hll_sketch(a, [], "v", p=P), hll_sketch(b, [], "v", p=P), p=P
    ).collect()[0]
    # true: |A|=200, |B|=300, |A u B|=400, |A n B|=100, J=0.25
    assert 120 < r.est_a < 280
    assert 200 < r.est_b < 420
    assert 280 < r.est_union < 560
    assert 0 < r.est_intersection < 250
    assert 0.03 < r.jaccard < 0.6


def test_extremes(spark, sets):
    a, _ = sets
    sa = hll_sketch(a, [], "v", p=P)
    same = hll_set_ops(sa, sa, p=P).collect()[0]
    assert same.est_intersection == same.est_a == same.est_union
    assert same.jaccard == 1.0
    dis = spark.createDataFrame([(f"x{i}",) for i in range(500)], "v string")
    r = hll_set_ops(sa, hll_sketch(dis, [], "v", p=P), p=P).collect()[0]
    assert r.jaccard < 0.25  # sketch noise, but far from overlapping


def test_grouped(spark):
    a = spark.createDataFrame(
        [("g1", f"v{i}") for i in range(50)]
        + [("g2", f"w{i}") for i in range(50)],
        "g string, v string",
    )
    b = spark.createDataFrame(
        [("g1", f"v{i}") for i in range(50)], "g string, v string"
    )
    got = {
        r.g: r
        for r in hll_set_ops(
            hll_sketch(a, ["g"], "v", p=P),
            hll_sketch(b, ["g"], "v", p=P),
            ["g"],
            p=P,
        ).collect()
    }
    assert got["g1"].jaccard == 1.0
    assert got["g2"].est_b == 0.0 and got["g2"].est_intersection == 0.0
