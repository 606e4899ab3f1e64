"""Embedding near-dup + IVF ANN operators (SURVEY training-pipeline ops).

Properties checked:
- cosine_neardup_pairs matches a numpy all-pairs computation exactly.
- lsh_cosine_pairs is a subset of the exact pairs at the same threshold
  (LSH never invents pairs; it may miss plane-split ones).
- ivf_topk with n_probe == n_centroids degenerates to exact brute-force
  top-k (probing every cell scores every vector).
"""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from horus_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_topk,
    lsh_cosine_pairs,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(3)
    base = rng.randn(40, 16)
    # plant three near-duplicate pairs
    base[10] = base[3] + 0.01 * rng.randn(16)
    base[20] = base[7] + 0.01 * rng.randn(16)
    base[30] = base[7] + 0.02 * rng.randn(16)
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    return df, np.array(
        [r[1] for r in sorted(rows)], dtype=np.float32
    ).astype(np.float64)


def _np_pairs(V, threshold):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(Vn @ Vn.T, 6)
    out = set()
    n = len(V)
    for a in range(n):
        for b in range(a + 1, n):
            if S[a, b] >= threshold:
                out.add((a, b))
    return out


def test_cosine_neardup_matches_numpy(emb_df):
    df, V = emb_df
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(df, threshold=0.9).collect()
    }
    assert got == _np_pairs(V, 0.9)
    assert {(3, 10), (7, 20), (7, 30)} <= got


def test_lsh_pairs_subset_of_exact(emb_df):
    df, V = emb_df
    planes = np.random.RandomState(5).randn(4, 16).tolist()
    lsh = {
        (r["id_a"], r["id_b"])
        for r in lsh_cosine_pairs(df, planes, threshold=0.5).collect()
    }
    exact = _np_pairs(V, 0.5)
    assert lsh <= exact
    # near-identical vectors agree on every hyperplane sign -> found
    assert (3, 10) in lsh and (7, 20) in lsh


def test_ivf_full_probe_equals_brute_force(emb_df):
    df, _ = emb_df
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    ivf = ivf_topk(df, q, n_centroids=8, n_probe=8, k=5).collect()
    bf = brute_force_topk(df, q, k=5).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert sorted([(r["q_id"], r["rank"], r["neighbor_id"], r["score"]) for r in ivf]) == sorted(
        [(r["q_id"], r["rank"], r["neighbor_id"], r["score"]) for r in bf]
    )


def test_ivf_partial_probe_is_plausible(emb_df):
    df, _ = emb_df
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_topk(df, q, n_centroids=8, n_probe=2, k=5)
    rows = out.collect()
    assert len(rows) <= 25
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    for q_id, rs in per_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)


def test_ivf_kmeans_centroids(spark):
    """kmeans_centroids: seeded-sample spherical k-means as the IVF recall
    path. On this synthetic (near-isotropic) corpus recall matches the
    lowest-id stand-in within noise, but cells are measurably better
    balanced — the property that bounds probe cost at scale."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from horus_spark.operators.similarity import (
        brute_force_topk,
        cosine_expr,
        ivf_topk,
        kmeans_centroids,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = kmeans_centroids(e, 8)
    assert len(cents) == 8 and len(cents[0]) == 64
    # determinism
    assert cents == kmeans_centroids(e, 8)

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.q_id, set()).add(r.neighbor_id)
        return out

    truth = topsets(brute_force_topk(e, q, k=10))
    got = topsets(ivf_topk(e, q, n_centroids=8, n_probe=3, k=10, centroids=cents))
    recall = sum(
        len(got.get(k, set()) & v) / len(v) for k, v in truth.items()
    ) / len(truth)
    assert recall >= 0.5  # probing 3/8 cells keeps most of the true top-10

    # cell balance: kmeans max-cell load must not exceed the naive stand-in's
    def max_cell(cent_df):
        v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
        w = Window.partitionBy("vec_id").orderBy(F.desc("c_score"), F.asc("c_id"))
        a = (
            v.crossJoin(F.broadcast(cent_df))
            .withColumn("c_score", F.round(cosine_expr(F.col("vec"), F.col("c_vec")), 6))
            .withColumn("rn", F.row_number().over(w))
            .filter("rn=1")
        )
        return max(r.cnt for r in a.groupBy("c_id").agg(F.count("*").alias("cnt")).collect())

    km_df = spark.createDataFrame(
        list(enumerate(cents)), "c_id int, c_vec array<double>"
    )
    naive_df = e.orderBy("vec_id").limit(8).select(
        F.col("vec_id").cast("int").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    assert max_cell(km_df) <= max_cell(naive_df)


def test_multiband_cosine_amplifies_recall(spark):
    """OR-amplified LSH: precision stays exact (subset of the brute-force
    pair set) and recall strictly dominates any single constituent band."""
    import numpy as np
    from pyspark.sql import functions as F

    from horus_spark.operators.similarity import (
        cosine_neardup_pairs,
        lsh_cosine_pairs,
        lsh_cosine_pairs_multiband,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rng = np.random.RandomState(23)
    plane_sets = [rng.randn(6, 64).tolist() for _ in range(3)]
    exact = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(e, 0.2).collect()}
    single = {(r.id_a, r.id_b) for r in lsh_cosine_pairs(e, plane_sets[0], 0.2).collect()}
    multi = {(r.id_a, r.id_b) for r in lsh_cosine_pairs_multiband(e, plane_sets, 0.2).collect()}
    assert multi <= exact            # verification keeps precision exact
    assert single <= multi           # band 0 candidates are contained
    assert len(multi) > len(single)  # amplification adds recall


def test_quantized_topk_recall_and_integrity(emb_df):
    """int8 two-tier ANN: quantized values bounded to +-127 (tinyint
    storage tier), candidate scores integer-derived, and the exact rerank
    keeps recall high vs brute force on this 16-dim corpus."""
    from horus_spark.operators.similarity import quantize_embeddings, quantized_topk

    df, V = emb_df
    qe = quantize_embeddings(df)
    assert dict(qe.dtypes)["qvec"] == "array<tinyint>"
    mx = qe.select(
        F.array_max(F.transform(F.col("qvec"), lambda x: F.abs(x.cast("int")))).alias("m")
    )
    assert mx.agg(F.max("m")).collect()[0][0] <= 127
    # round-trip error bounded by scale/2 per component
    err = qe.join(df, qe.id == df.vec_id).select(
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("qvec"),
                lambda x, q: F.abs(x - q.cast("double") * F.col("scale")),
            )
        ).alias("e"),
        (F.col("scale") / 2 + 1e-12).alias("bound"),
    )
    assert err.filter(F.col("e") > F.col("bound")).count() == 0

    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    def topsets(res):
        out = {}
        for r in res.collect():
            out.setdefault(r.q_id, set()).add(r.neighbor_id)
        return out
    truth = topsets(brute_force_topk(df, q, k=5))
    got = topsets(quantized_topk(df, q, k=5, rerank=3))
    recall = sum(len(got[k] & v) / len(v) for k, v in truth.items()) / len(truth)
    assert recall >= 0.9  # int8 + 3x rerank keeps nearly all of the top-5
    # reranked scores are EXACT float cosines (match brute force values)
    bf = {(r.q_id, r.neighbor_id): r.score for r in brute_force_topk(df, q, k=5).collect()}
    for r in quantized_topk(df, q, k=5, rerank=3).collect():
        if (r.q_id, r.neighbor_id) in bf:
            assert r.score == bf[(r.q_id, r.neighbor_id)]


def test_quantize_zero_vector_no_nulls(spark):
    """An all-zero vector has scale max|x|/127 = 0; without the divisor
    clamp Spark's x/0 would yield an all-NULL qvec (and NULL candidate
    scores downstream). The clamp maps it to an all-zero qvec."""
    from horus_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id int, embedding array<double>",
    )
    rows = {r.id: r for r in quantize_embeddings(df).collect()}
    assert rows[0].qvec == [0, 0, 0]
    assert all(v is not None for v in rows[1].qvec)


def test_ivf_quantized_plan_and_recall(spark, emb_df):
    """IVF-SQ composition: the coarse tier must be behind the cell
    equi-join (broadcast hash join on `cell`) — never a
    BroadcastNestedLoopJoin / cross join over the full corpus (the
    r3-flagged q34 flaw) — and its corpus rows must carry int8 qvecs,
    not the float payload. Recall vs brute force stays high."""
    from horus_spark.operators.similarity import brute_force_topk, ivf_quantized_topk

    df, V = emb_df
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    res = ivf_quantized_topk(
        df, q, n_centroids=8, n_probe=4, k=5, rerank=3, centroids="lowest_id"
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    def topsets(r):
        out = {}
        for row in r.collect():
            out.setdefault(row.q_id, set()).add(row.neighbor_id)
        return out

    truth = topsets(brute_force_topk(df, q, k=5))
    got = topsets(res)
    recall = sum(len(got.get(k_, set()) & v) / len(v) for k_, v in truth.items()) / len(truth)
    assert recall >= 0.8  # n_probe=4 of 8 cells + int8 coarse ordering


def test_lsh_pairs_candidate_join_carries_ids_only(spark, emb_df):
    """q24's fix: the bucket self-join must Exchange (id, band, bucket)
    ints only — embedding arrays join back by id AFTER candidate
    generation. Detect payload shipping by checking that no Exchange in
    the candidate subtree carries an array column named vec_a/vec_b."""
    from horus_spark.operators.similarity import (
        lsh_cosine_pairs,
        lsh_cosine_pairs_multiband,
    )

    df, V = emb_df
    planes = np.random.RandomState(7).randn(4, V.shape[1]).tolist()
    single = lsh_cosine_pairs(df, planes, threshold=0.2)
    multi = lsh_cosine_pairs_multiband(df, [planes], threshold=0.2)
    # single-band IS the one-band multiband now: identical results
    assert sorted(map(tuple, single.collect())) == sorted(map(tuple, multi.collect()))
    # the bucket-join Exchanges (hashpartitioning on band, bucket) must
    # carry exactly (id, band, bucket) — the old implementation shipped
    # two copies of every embedding through this shuffle
    txt = single._sc._jvm.PythonSQLUtils.explainString(
        single._jdf.queryExecution(), "formatted"
    )
    blocks = re.split(r"\n\(\d+\) ", txt)
    bucket_exchanges = [
        b for b in blocks
        if b.startswith("Exchange") and "hashpartitioning(band" in b
    ]
    assert bucket_exchanges, "expected bucket-join Exchanges in the plan"
    for b in bucket_exchanges:
        m = re.search(r"Input \[\d+\]: \[(.*?)\]", b)
        cols = m.group(1)
        assert "embedding" not in cols and "vec" not in cols, cols
        assert len(cols.split(",")) == 3  # id, band, bucket — nothing else


def test_q184_ann_recall_audit(spark):
    """IVF recall@10 vs brute truth: high but honestly sub-perfect at
    4/16 probes — the measured pruning loss, not a guess."""
    import __spark_entry__ as e

    rows = e.queries()["q184_ann_recall"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_truth"] == 10
        assert 0 <= r["n_matched"] <= 10
        assert r["recall_ppm"] == r["n_matched"] * 1_000_000 // 10
    mean = sum(r["n_matched"] for r in rows) / 100
    assert 0.7 <= mean <= 1.0
