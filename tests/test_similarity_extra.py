"""Embedding near-dup + IVF ANN operators (SURVEY training-pipeline ops).

Properties checked:
- cosine_neardup_pairs matches a numpy all-pairs computation exactly.
- lsh_cosine_pairs is a subset of the exact pairs at the same threshold
  (LSH never invents pairs; it may miss plane-split ones).
- ivf_topk with n_probe == n_centroids degenerates to exact brute-force
  top-k (probing every cell scores every vector).
"""

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
