"""Hashed linear classifier: python NB-log-odds replay (bit-exact
micro-nats), separable-class recovery, empty/unseen handling,
partitioning invariance, and parameter guards."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.classifier import (
    BIAS_BUCKET,
    UNSEEN_BUCKET,
    classifier_score,
    fit_hashed_classifier,
)

B = 64


def _bucket(feat: str) -> int:
    h = int(hashlib.md5((feat + "clf").encode()).hexdigest()[:15], 16)
    return h % B


def _feats(text: str) -> list[int]:
    toks = text.split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(g) for g in grams]


def _fit_py(rows, alpha=1.0):
    pos, neg = {}, {}
    n_pos = n_neg = 0
    for y, text in rows:
        (pos if y else neg).__class__  # noqa: B018 - keep lint quiet
        n_pos += y
        n_neg += 1 - y
        for b in _feats(text):
            d = pos if y else neg
            d[b] = d.get(b, 0) + 1
    pos_tot, neg_tot = sum(pos.values()), sum(neg.values())
    w = {}
    for b in set(pos) | set(neg):
        w[b] = round(
            (
                math.log((pos.get(b, 0) + alpha) / (pos_tot + alpha * B))
                - math.log((neg.get(b, 0) + alpha) / (neg_tot + alpha * B))
            )
            * 1e6
        )
    w[BIAS_BUCKET] = round(
        math.log((n_pos + alpha) / (n_neg + alpha)) * 1e6
    )
    w[UNSEEN_BUCKET] = round(
        (math.log(neg_tot + alpha * B) - math.log(pos_tot + alpha * B)) * 1e6
    )
    return w


ROWS = [
    (1, "good clean prose flows here"),
    (1, "clean prose reads well"),
    (1, "good prose flows well here"),
    (0, "zzz spam spam buy buy"),
    (0, "buy zzz spam now now"),
    (0, "spam zzz buy buy now"),
]


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(
        [(i, y, t) for i, (y, t) in enumerate(ROWS)],
        "doc_id long, y int, text string",
    )


def test_fit_matches_python_replay(spark, labeled):
    got = {
        r.bucket: r.w_micro
        for r in fit_hashed_classifier(
            labeled, "y", n_buckets=B
        ).collect()
    }
    assert got == _fit_py(ROWS)


def test_score_matches_python_and_separates(spark, labeled):
    model = fit_hashed_classifier(labeled, "y", n_buckets=B)
    got = {
        r.doc_id: (r.n_feats, r.score_micro, r.keep)
        for r in classifier_score(labeled, model, n_buckets=B).collect()
    }
    w = _fit_py(ROWS)
    for i, (y, text) in enumerate(ROWS):
        fs = _feats(text)
        exp = w[BIAS_BUCKET] + sum(w.get(b, w[UNSEEN_BUCKET]) for b in fs)
        assert got[i] == (len(fs), exp, exp >= 0)
        # the classes are cleanly separable -> self-fit must recover them
        assert got[i][2] == bool(y)


def test_empty_doc_and_unseen_tokens(spark, labeled):
    model = fit_hashed_classifier(labeled, "y", n_buckets=B)
    probe = spark.createDataFrame(
        [(100, ""), (101, "   "), (102, "totally-novel-token")],
        "doc_id long, text string",
    )
    w = _fit_py(ROWS)
    got = {
        r.doc_id: (r.n_feats, r.score_micro)
        for r in classifier_score(probe, model, n_buckets=B).collect()
    }
    assert got[100] == (0, w[BIAS_BUCKET])
    assert got[101] == (0, w[BIAS_BUCKET])
    nb = _bucket("totally-novel-token")
    assert got[102] == (1, w[BIAS_BUCKET] + w.get(nb, w[UNSEEN_BUCKET]))


def test_partitioning_invariance(spark, labeled):
    ref = fit_hashed_classifier(labeled, "y", n_buckets=B)
    rep = fit_hashed_classifier(labeled.repartition(7), "y", n_buckets=B)
    assert sorted(map(tuple, ref.collect())) == sorted(
        map(tuple, rep.collect())
    )
    s1 = classifier_score(labeled, ref, n_buckets=B)
    s2 = classifier_score(labeled.repartition(5), ref, n_buckets=B)
    assert sorted(map(tuple, s1.collect())) == sorted(
        map(tuple, s2.collect())
    )


def test_guards(spark, labeled):
    with pytest.raises(ValueError):
        fit_hashed_classifier(labeled, "y", n_buckets=1)
    with pytest.raises(ValueError):
        fit_hashed_classifier(labeled, "y", alpha=0.0)
    with pytest.raises(ValueError, match="sentinel"):
        classifier_score(
            labeled, labeled.select(F.lit(3).alias("bucket"),
                                    F.lit(1).cast("long").alias("w_micro")),
            n_buckets=B,
        )
