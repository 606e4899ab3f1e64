"""IVF-PQ ANN (operators/pq.py, oracle q120)."""

import math

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.pq import ivf_pq_topk, pq_codebooks, pq_encode

D, M, DS, KSUB = 16, 4, 4, 4


def _centers():
    # center c: value 10 at offset c of every 4-dim subspace
    return [
        [10.0 if p % DS == c else 0.0 for p in range(D)] for c in range(KSUB)
    ]


def _blob_vectors():
    # 25 points per blob, deterministic jitter
    rows = []
    cents = _centers()
    for c in range(KSUB):
        for i in range(25):
            v = [
                x + 0.01 * ((i * 7 + p * 3 + c) % 11 - 5)
                for p, x in enumerate(cents[c])
            ]
            rows.append((c * 25 + i, v))
    return rows


def test_pq_encode_matches_python(spark):
    rows = _blob_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = [[c[j * DS : (j + 1) * DS] for c in _centers()] for j in range(M)]
    got = {r.id: list(r.codes) for r in pq_encode(df, cbs).collect()}
    for vid, vec in rows:
        want = []
        for j in range(M):
            sub = vec[j * DS : (j + 1) * DS]
            dots = [
                round(sum(a * b for a, b in zip(sub, cb)), 6)
                for cb in cbs[j]
            ]
            want.append(dots.index(max(dots)))
        assert got[vid] == want, vid
    # every blob member encodes to its own blob's codeword in every subspace
    for vid, _ in rows:
        assert got[vid] == [vid // 25] * M


def test_ivf_pq_recovers_true_topk_on_blobs(spark):
    rows = _blob_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = [[c[j * DS : (j + 1) * DS] for c in _centers()] for j in range(M)]
    q = df.where(F.col("vec_id").isin([0, 25, 50, 75])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # within one blob every member shares the same PQ codes, so the ADC
    # tier ties across the whole cell — rerank*k must cover the cell
    # (24 rivals) for exact recovery; that tie-blindness inside a code
    # cell is PQ's documented lossiness, not a defect.
    out = ivf_pq_topk(
        df, q, cbs, n_centroids=KSUB, n_probe=1, k=5, rerank=5,
        centroids=_centers(),
    )
    got = {
        (r.q_id, r.rank): r.neighbor_id for r in out.collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    vecs = dict(rows)
    for qid in (0, 25, 50, 75):
        scored = sorted(
            (
                (round(cos(vecs[n], vecs[qid]), 6), -n)
                for n in vecs
                if n != qid
            ),
            reverse=True,
        )[:5]
        want = [-s[1] for s in scored]
        assert [got[(qid, r)] for r in range(1, 6)] == want, qid


def test_pq_codebooks_and_guards(spark):
    rows = _blob_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = pq_codebooks(df, m=M, ksub=KSUB)
    assert len(cbs) == M and len(cbs[0]) == KSUB and len(cbs[0][0]) == DS
    # lowest-id convention: codebooks[j][c] = slice j of vector c
    vecs = dict(rows)
    assert cbs[1][2] == vecs[2][DS : 2 * DS]
    with pytest.raises(ValueError):
        pq_codebooks(df, m=5)          # 16 % 5 != 0
    with pytest.raises(ValueError):
        pq_codebooks(df.limit(3), m=M, ksub=KSUB)  # too few vectors
