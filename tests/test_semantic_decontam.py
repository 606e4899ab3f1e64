"""Semantic benchmark decontamination (semdedup.py, oracle q121)."""

from horus_spark.operators.semdedup import semantic_decontaminate


def test_semantic_decontaminate(spark):
    bench = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
        ],
        "b_id long, b_vec array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (10, [0.99, 0.01, 0.0, 0.0]),   # near-clone of bench 0
            (11, [0.0, 0.0, 1.0, 0.0]),     # orthogonal to both
            (12, [1.0, 1.0, 0.0, 0.0]),     # cos ~0.7071 to BOTH (tie)
            (13, [0.0, -1.0, 0.0, 0.0]),    # anti-parallel to bench 1
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.id: (r.nearest_benchmark, r.max_cos, r.contaminated)
        for r in semantic_decontaminate(corpus, bench, 0.9).collect()
    }
    assert got[10][0] == 0 and got[10][2] == 1 and got[10][1] > 0.99
    assert got[11] == (0, 0.0, 0)           # 0.0 to both -> lowest b_id
    assert got[12][0] == 0 and got[12][2] == 0   # exact tie -> b_id 0
    assert round(got[12][1], 4) == 0.7071
    assert got[13] == (0, 0.0, 0)           # max(0.0, -1.0) -> bench 0
    assert len(got) == 4                     # every corpus doc verdicted
