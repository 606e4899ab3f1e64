"""Bloom-tier decontamination + KMV distinct sketch (q50/q51 units)."""

import hashlib

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_bloom_matches_exact_decontaminate(spark):
    # The load-bearing property: the bloom tier changes the PLAN, never
    # the ANSWER (no false negatives; false positives die in the exact
    # join). Mixed contaminated / clean / short docs.
    from horus_spark.operators.bloom import bloom_decontaminate
    from horus_spark.operators.decontam import decontaminate

    bench = _docs(spark, [("b1", "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [
            ("c1", "xx alpha beta gamma delta epsilon yy"),  # hit
            ("c2", "one two three four five six seven"),  # clean
            ("c3", "alpha beta"),  # too short for 5-grams
            ("c4", "beta gamma delta epsilon zeta trailing words here"),  # hit
        ],
    )
    kwargs = dict(n=5, min_collisions=1, normalize=True)
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_collisions"], r["is_contaminated"])
        for r in decontaminate(corpus, bench, **kwargs).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_collisions"], r["is_contaminated"])
        for r in bloom_decontaminate(
            corpus, bench, m_bits=1 << 10, k_hashes=3, **kwargs
        ).collect()
    }
    assert bloom == exact
    assert exact["c1"][2] and exact["c4"][2] and not exact["c2"][2]
    assert exact["c3"] == (0, 0, False)


def test_bloom_prunes_clean_grams(spark):
    # A disjoint corpus: with a reasonably sized bitmap, the map-side
    # probe should drop (nearly) every gram before the exact join.
    from horus_spark.operators.bloom import (
        _shingle_hashes,
        bloom_probe_expr,
        build_bloom,
    )

    bench = _docs(spark, [("b1", "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [(f"c{i}", " ".join(f"w{i}x{j}" for j in range(30))) for i in range(20)],
    )
    bench_grams = _shingle_hashes(bench, "doc_id", "text", 5, True).select("gram").distinct()
    bitmap = build_bloom(bench_grams, "gram", m_bits=1 << 14, k_hashes=4)
    assert len(bitmap) == (1 << 14) // 64

    corpus_grams = _shingle_hashes(corpus, "doc_id", "text", 5, True)
    total = corpus_grams.count()
    survivors = corpus_grams.filter(
        bloom_probe_expr(F.col("gram"), bitmap, 4)
    ).count()
    assert total == 20 * 26
    # 2 bench grams in 2^14 bits: false-positive rate is ~(24/16384)^4
    assert survivors == 0


def test_bloom_no_false_negatives_all_bench_grams_pass(spark):
    # Every benchmark gram must pass its own bloom — by construction.
    from horus_spark.operators.bloom import (
        _shingle_hashes,
        bloom_probe_expr,
        build_bloom,
    )

    bench = _docs(
        spark,
        [(f"b{i}", " ".join(f"t{i} u{i} v{j}" for j in range(12))) for i in range(10)],
    )
    grams = _shingle_hashes(bench, "doc_id", "text", 5, True).select("gram").distinct()
    bitmap = build_bloom(grams, "gram", m_bits=1 << 10, k_hashes=4)
    n = grams.count()
    passed = grams.filter(bloom_probe_expr(F.col("gram"), bitmap, 4)).count()
    assert passed == n > 0


def test_bloom_shuffle_fallback_same_answer(spark):
    from horus_spark.operators.bloom import bloom_decontaminate

    bench = _docs(spark, [("b1", "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [("c1", "xx alpha beta gamma delta epsilon yy"), ("c2", "a b c d e f g")],
    )
    a = bloom_decontaminate(corpus, bench, broadcast_benchmark=True).collect()
    b = bloom_decontaminate(corpus, bench, broadcast_benchmark=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _kmv_python(values, k, salt):
    """Driver-side replay of the exact KMV math."""
    hs = sorted(
        {
            (int(hashlib.md5((v + salt).encode()).hexdigest()[:15], 16) + 1.0)
            / float(1 << 60)
            for v in values
        }
    )
    mins = hs[:k]
    if len(mins) < k:
        return len(mins), float(len(mins))
    return k, round((k - 1) / mins[k - 1], 4)


def test_kmv_exact_below_k_and_estimator_above(spark):
    from horus_spark.operators.sketches import kmv_distinct

    rows = [("small", f"v{i % 5}") for i in range(50)] + [
        ("big", f"x{i}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {
        r["g"]: (r["n_seen_min"], r["est_distinct"])
        for r in kmv_distinct(df, ["g"], "v", k=16, salt="t").collect()
    }
    assert out["small"] == _kmv_python([f"v{i % 5}" for i in range(50)], 16, "t")
    assert out["small"] == (5, 5.0)
    exp_big = _kmv_python([f"x{i}" for i in range(500)], 16, "t")
    assert out["big"] == exp_big
    # the estimate should be in the right ballpark of the true 500
    assert 250 <= out["big"][1] <= 1000


def test_kmv_partitioning_invariant(spark):
    # The merge property: per-batch top-k pruning cannot change the
    # global k minima — same answer at any parallelism.
    from horus_spark.operators.sketches import kmv_distinct

    rows = [(f"g{i % 3}", f"val{i % 97}") for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v string")
    one = sorted(
        map(tuple, kmv_distinct(df.coalesce(1), ["g"], "v", k=8).collect())
    )
    many = sorted(
        map(tuple, kmv_distinct(df.repartition(16), ["g"], "v", k=8).collect())
    )
    assert one == many


def test_kmv_rejects_bad_k(spark):
    from horus_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([("a", "b")], "g string, v string")
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=1)


def test_approx_distinct_runs(spark):
    from horus_spark.operators.sketches import approx_distinct

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(200)], "g string, v string"
    )
    [row] = approx_distinct(df, ["g"], "v").collect()
    assert 150 <= row["approx_distinct"] <= 250


def test_kmv_null_group_key_kept(spark):
    # pandas groupby drops NULL keys by default; the kernel must not —
    # Spark's own groupBy (and approx_distinct) keeps the NULL group.
    from horus_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("en", "a"), ("en", "b"), (None, "x"), (None, "y"), (None, "x")],
        "g string, v string",
    )
    rows = {r["g"]: (r["n_seen_min"], r["est_distinct"])
            for r in kmv_distinct(df, ["g"], "v", k=8).collect()}
    assert rows["en"] == (2, 2.0)
    assert rows[None] == (2, 2.0)


# ---------------------------------------------------------- kmv set ops


def test_kmv_set_ops_exact_below_k(spark):
    from horus_spark.operators.sketches import kmv_set_ops, kmv_sketch

    # tiny sets (< k): every estimate must be EXACT set arithmetic
    a = spark.createDataFrame(
        [("h", str(v)) for v in [1, 2, 3, 4]], ["g", "v"]
    )
    b = spark.createDataFrame(
        [("h", str(v)) for v in [3, 4, 5]], ["g", "v"]
    )
    sa = kmv_sketch(a, ["g"], "v", k=16, salt="t")
    sb = kmv_sketch(b, ["g"], "v", k=16, salt="t")
    r = kmv_set_ops(sa, sb, ["g"], k=16).collect()[0]
    assert r["est_a"] == 4.0 and r["est_b"] == 3.0
    assert r["est_union"] == 5.0
    assert r["jaccard"] == 0.4  # |{3,4}| / |{1..5}|
    assert r["est_intersection"] == 2.0


def test_kmv_union_sketch_equals_sketch_of_union(spark):
    from horus_spark.operators.sketches import kmv_distinct, kmv_set_ops, kmv_sketch

    vals_a = [("g", f"a{i}") for i in range(200)]
    vals_b = [("g", f"a{i}") for i in range(100, 300)]  # overlap 100..199
    a = spark.createDataFrame(vals_a, ["g", "v"])
    b = spark.createDataFrame(vals_b, ["g", "v"])
    k = 32
    ops = kmv_set_ops(
        kmv_sketch(a, ["g"], "v", k=k, salt="u"),
        kmv_sketch(b, ["g"], "v", k=k, salt="u"),
        ["g"],
        k=k,
    ).collect()[0]
    direct = kmv_distinct(
        a.unionByName(b), ["g"], "v", k=k, salt="u"
    ).collect()[0]
    # merge property: the recut union sketch IS the union's sketch
    assert ops["est_union"] == direct["est_distinct"]


def test_kmv_set_ops_missing_side_empty(spark):
    from horus_spark.operators.sketches import kmv_set_ops, kmv_sketch

    a = spark.createDataFrame([("only_a", "x"), ("only_a", "y")], ["g", "v"])
    b = spark.createDataFrame([("only_b", "z")], ["g", "v"])
    out = {
        r["g"]: r
        for r in kmv_set_ops(
            kmv_sketch(a, ["g"], "v", k=8, salt="m"),
            kmv_sketch(b, ["g"], "v", k=8, salt="m"),
            ["g"],
            k=8,
        ).collect()
    }
    assert out["only_a"]["est_b"] == 0.0
    assert out["only_a"]["est_a"] == 2.0
    assert out["only_a"]["jaccard"] == 0.0
    assert out["only_b"]["est_a"] == 0.0
    assert out["only_b"]["est_intersection"] == 0.0
