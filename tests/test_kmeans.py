"""Distributed Lloyd k-means (q73 units)."""

import pytest
from pyspark.sql import functions as F


def _py_lloyd(vectors, k, n_iter):
    """Exact replay of kmeans_fit_full's arithmetic: left-fold double
    distances, first-min tie-break, micro-int sums, exact-integer double
    division, empty cluster keeps previous centroid."""
    cents = [list(map(float, v)) for v in vectors[:k]]
    for _ in range(n_iter):
        sums = {}
        for v in vectors:
            dists = []
            for c in cents:
                acc = 0.0
                for x, y in zip(v, c):
                    acc = acc + (x - y) * (x - y)
                dists.append(acc)
            cid = dists.index(min(dists))
            s, n = sums.setdefault(cid, ([0] * len(v), 0))
            for i, x in enumerate(v):
                # Spark round() is HALF_UP on doubles; python round is
                # banker's — replicate HALF_UP via floor(x+0.5) on the
                # non-negative magnitudes used here
                import math

                m = x * 1_000_000
                s[i] += int(math.floor(m + 0.5)) if m >= 0 else -int(
                    math.floor(-m + 0.5)
                )
            sums[cid] = (s, n + 1)
        new = [list(c) for c in cents]
        for cid, (s, n) in sums.items():
            new[cid] = [si / (n * 1_000_000) for si in s]
        cents = new
    return cents


def test_kmeans_matches_python_replay(spark):
    from horus_spark.operators.kmeans import kmeans_fit_full

    import random

    rng = random.Random(7)
    vectors = [
        [round(rng.uniform(-1, 1), 4) for _ in range(6)] for _ in range(120)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)], "vec_id long, embedding array<double>"
    )
    got = kmeans_fit_full(df, k=4, n_iter=4)
    want = _py_lloyd(vectors, 4, 4)
    assert got == want  # bit-exact, not approximately


def test_kmeans_partitioning_invariant(spark):
    from horus_spark.operators.kmeans import kmeans_fit_full

    import random

    rng = random.Random(11)
    vectors = [[rng.uniform(-1, 1) for _ in range(5)] for _ in range(200)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)], "vec_id long, embedding array<double>"
    )
    a = kmeans_fit_full(df.repartition(1), k=3, n_iter=3)
    b = kmeans_fit_full(df.repartition(16), k=3, n_iter=3)
    assert a == b


def test_kmeans_separated_clusters_found(spark):
    from horus_spark.operators.kmeans import kmeans_clusters

    # two tight blobs around (0,0) and (10,10): 2-means must split them
    pts = [(i, [0.0 + (i % 5) * 0.01, 0.0 + (i % 3) * 0.01]) for i in range(30)]
    pts += [(100 + i, [10.0 + (i % 5) * 0.01, 10.0 + (i % 3) * 0.01]) for i in range(20)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    rows = kmeans_clusters(df, k=2, n_iter=5).collect()
    sizes = sorted(r["n_points"] for r in rows)
    assert sizes == [20, 30]
    cents = {r["n_points"]: r["centroid"] for r in rows}
    assert cents[30][0] < 1.0 and cents[20][0] > 9.0


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    from horus_spark.operators.kmeans import kmeans_fit_full

    # k=3 over two distinct points: one centroid can never win a point
    # and must stay at its init position
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [0.0]), (2, [8.0])], "vec_id long, embedding array<double>"
    )
    cents = kmeans_fit_full(df, k=3, n_iter=3)
    # init = vectors of ids 0,1,2 -> [0.0],[0.0],[8.0]; all 0.0-points
    # tie-break to cluster 0, so cluster 1 goes empty and keeps [0.0]
    assert cents[1] == [0.0]
    assert cents[0] == [0.0] and cents[2] == [8.0]


def test_kmeans_assign_is_map_side_only(spark):
    from horus_spark.operators.kmeans import kmeans_assign

    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [5.0, 5.0])], "vec_id long, embedding array<double>"
    )
    out = kmeans_assign(df, [[0.0, 0.0], [5.0, 5.0]])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1}


def test_kmeans_rejects_bad_params(spark):
    from horus_spark.operators.kmeans import kmeans_fit_full

    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_fit_full(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit_full(df, k=5)  # fewer rows than k


def test_cluster_balanced_sample_quota_and_determinism(spark):
    from horus_spark.operators.kmeans import cluster_balanced_sample

    # 20 points near (0,0), 3 near (50,50), one NULL vector
    rows = [(i, [float(i % 5), float(i // 5)]) for i in range(20)]
    rows += [(100 + i, [50.0 + i, 50.0]) for i in range(3)]
    rows += [(999, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = cluster_balanced_sample(df, k=2, n_iter=4, per_cluster=5).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    sizes = sorted(len(v) for v in by_cluster.values())
    # the dense mode contributes exactly the quota, the rare mode all 3 —
    # a uniform sample of 8 would almost surely have drowned the rare mode
    assert sizes == [3, 5]
    assert all(1 <= r["pick_rank"] <= 5 for r in out)
    assert all(r["vec_id"] != 999 for r in out)  # NULL vector excluded

    again = cluster_balanced_sample(df, k=2, n_iter=4, per_cluster=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    with pytest.raises(ValueError):
        cluster_balanced_sample(df, k=2, per_cluster=0)
