"""keep_best_per_cluster (the dedup decision) and containment_pairs
(asymmetric subset/superset near-dup detection)."""

import pytest
from pyspark.sql import functions as F


def test_keep_best_per_cluster(spark):
    from horus_spark.operators.components import keep_best_per_cluster

    docs = spark.createDataFrame(
        [
            ("a", 10),
            ("b", 99),   # best in cluster {a,b,c}
            ("c", 50),
            ("d", 7),    # singleton
            ("e", 42),   # tie with f -> min id wins
            ("f", 42),
        ],
        "doc_id string, quality int",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("e", "f")], "id_a string, id_b string"
    )
    got = {r["doc_id"]: r for r in keep_best_per_cluster(docs, pairs, "quality").collect()}
    assert len(got) == 6  # every input row kept with a verdict
    # cluster {a,b,c}: canonical id a, size 3, winner b by quality
    for did in ("a", "b", "c"):
        assert got[did]["cluster_id"] == "a" and got[did]["cluster_size"] == 3
    assert got["b"]["keep"] is True
    assert got["a"]["keep"] is False and got["c"]["keep"] is False
    # singleton keeps itself
    assert got["d"]["cluster_id"] == "d" and got["d"]["keep"] is True
    # quality tie broken by minimum id
    assert got["e"]["keep"] is True and got["f"]["keep"] is False
    # exactly one winner per cluster
    winners = [r for r in got.values() if r["keep"]]
    assert len(winners) == len({r["cluster_id"] for r in got.values()})


def test_containment_catches_subset_jaccard_misses(spark):
    from horus_spark.operators.dedup import containment_pairs, jaccard_pairs

    small = "w1 w2 w3 w4 w5"  # 3 distinct 3-shingles
    filler = " ".join(f"x{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            ("a", small),            # fully contained in b
            ("b", small + " " + filler),
            ("c", "totally unrelated words living here quietly today"),
        ],
        "doc_id string, text string",
    )
    got = {(r["id_a"], r["id_b"]): r for r in containment_pairs(df, threshold=0.9).collect()}
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert r["containment_a"] == pytest.approx(1.0)   # all of a's shingles in b
    assert r["containment_b"] < 0.15                  # b barely overlaps a
    # jaccard at any near-dup threshold misses this pair entirely
    j = jaccard_pairs(df, threshold=0.2).collect()
    assert all(not (p["id_a"] == "a" and p["id_b"] == "b") for p in j)


def test_containment_threshold_and_direction(spark):
    from horus_spark.operators.dedup import containment_pairs

    # half of a's 4 shingles appear in b (shared prefix of 5 tokens ->
    # 3 shared shingles out of a's 6)
    a = "s1 s2 s3 s4 s5 a6 a7 a8"
    b = "s1 s2 s3 s4 s5 b6 b7 b8 b9 b10"
    df = spark.createDataFrame([("a", a), ("b", b)], "doc_id string, text string")
    rows = containment_pairs(df, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    # a has 6 shingles, b has 8; shared = 3 ("s1 s2 s3".."s3 s4 s5")
    assert r["containment_a"] == pytest.approx(0.5)
    assert r["containment_b"] == pytest.approx(0.375)
    # raising the threshold above both directions drops the pair
    assert containment_pairs(df, threshold=0.6).collect() == []
