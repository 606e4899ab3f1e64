"""Signed random projection: exact python replay, negation symmetry,
distance-preservation sanity, malformed-row lazy failure, guards."""

import hashlib

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.similarity import srp_project, srp_signs

IN, OUT = 8, 4


def _signs():
    out = []
    for j in range(OUT):
        row = []
        for i in range(IN):
            h = int(
                hashlib.md5(f"{j}-{i}-srp".encode()).hexdigest()[:15], 16
            )
            row.append(1 if h % 2 == 0 else -1)
        out.append(row)
    return out


def _py_project(vec):
    import math

    q = [math.floor(x * 1e6 + 0.5) for x in vec]
    return [sum(s * x for s, x in zip(row, q)) for row in _signs()]


VECS = [
    (0, [0.1, -0.2, 0.3, 0.0, 1.0, -1.0, 0.5, -0.5]),
    (1, [0.0] * 8),
    (2, [1.0] * 8),
]


def test_signs_module_matches_local_replay():
    assert srp_signs(OUT, IN) == _signs()


def test_exact_python_replay(spark):
    df = spark.createDataFrame(VECS, "vec_id long, embedding array<double>")
    got = {}
    for r in srp_project(df, in_dim=IN, out_dim=OUT).collect():
        got.setdefault(r.id, {})[r.dim] = r.value
    for vid, vec in VECS:
        exp = _py_project(vec)
        assert [got[vid][j] for j in range(OUT)] == exp


def test_negation_symmetry(spark):
    pos = [(0, [0.3, -0.7, 0.2, 0.9, -0.1, 0.4, -0.6, 0.8])]
    neg = [(0, [-x for x in pos[0][1]])]
    a = {
        r.dim: r.value
        for r in srp_project(
            spark.createDataFrame(pos, "vec_id long, embedding array<double>"),
            in_dim=IN,
            out_dim=OUT,
        ).collect()
    }
    b = {
        r.dim: r.value
        for r in srp_project(
            spark.createDataFrame(neg, "vec_id long, embedding array<double>"),
            in_dim=IN,
            out_dim=OUT,
        ).collect()
    }
    assert all(a[j] == -b[j] for j in range(OUT))


def test_close_vectors_stay_close(spark):
    base = [0.5, -0.5, 0.25, 0.75, -0.25, 0.1, -0.9, 0.6]
    near = [x + 0.001 for x in base]
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<double>",
    )
    p = {}
    for r in srp_project(df, in_dim=IN, out_dim=OUT).collect():
        p.setdefault(r.id, {})[r.dim] = r.value

    def dist(a, b):
        return sum((a[j] - b[j]) ** 2 for j in range(OUT))

    assert dist(p[0], p[1]) < dist(p[0], p[2])


def test_malformed_row_fails_lazily_and_guards(spark):
    df = spark.createDataFrame(
        [(0, [0.1] * IN), (1, [0.1] * (IN - 1))],
        "vec_id long, embedding array<double>",
    )
    out = srp_project(df, in_dim=IN, out_dim=OUT)  # no job yet
    with pytest.raises(Exception, match="8-dim"):
        out.collect()
    with pytest.raises(ValueError):
        srp_project(df, in_dim=0)
