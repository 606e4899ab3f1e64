"""Margin-based bitext mining (operators/bitext.py)."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.bitext import margin_bitext_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mutual_best_and_margin(spark):
    # s0 <-> t0 is a clean mutual pair that stands out; s1's best is
    # t0 too (not mutual -> dropped); t1 is background noise.
    src = _df(
        spark,
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 0.0, 1.0]),
        ],
    )
    tgt = _df(
        spark,
        [
            (10, [1.0, 0.05, 0.0]),
            (11, [0.2, 0.9, 0.1]),
            (12, [0.0, 0.1, 1.0]),
        ],
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["margin_ppm"]
        for r in margin_bitext_pairs(
            src, tgt, k=2, threshold_ppm=1_000_000
        ).collect()
    }
    assert (0, 10) in got  # clean mutual translation
    assert (2, 12) in got
    assert all(s != 1 for s, _ in got)  # s1 lost the mutuality race
    assert all(m >= 1_000_000 for m in got.values())


def test_hub_vector_suppressed_by_margin(spark):
    # t10 is a hub: three sources crowd it, so its kNN background is
    # nearly as high as its best cosine and the ratio margin stays low
    # (~1.10) even though its raw cosine (0.99975) beats the distinct
    # pair's (0.99494). A threshold between the two margins keeps ONLY
    # the distinct pair — the exact failure mode raw cosine-threshold
    # mining gets wrong (it would keep the hub pair first).
    src = _df(
        spark,
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.6, 0.8, 0.0]),
            (2, [0.55, 0.83, 0.0]),
            (3, [0.5, 0.86, 0.0]),
        ],
    )
    tgt = _df(spark, [(10, [0.57, 0.82, 0.0]), (11, [0.99, 0.1, 0.0])])
    all_pairs = {
        (r["src_id"], r["tgt_id"]): (r["cos_micro"], r["margin_ppm"])
        for r in margin_bitext_pairs(src, tgt, k=2, threshold_ppm=0).collect()
    }
    assert all_pairs[(2, 10)][0] > all_pairs[(0, 11)][0]  # hub wins cosine
    assert all_pairs[(2, 10)][1] < all_pairs[(0, 11)][1]  # loses margin
    mined = margin_bitext_pairs(src, tgt, k=2, threshold_ppm=1_150_000)
    assert {(r["src_id"], r["tgt_id"]) for r in mined.collect()} == {(0, 11)}


def test_python_replay_differential(spark):
    import hashlib

    def vec(seed, dim=8):
        h = hashlib.md5(str(seed).encode()).digest()
        return [((b % 200) - 100) / 100.0 for b in h[:dim]]

    src_rows = [(i, vec(i)) for i in range(12)]
    tgt_rows = [(100 + i, vec(1000 + i)) for i in range(12)]

    def cos(a, b):
        import math

        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    k, thr = 3, 900_000
    cm = {
        (s, t): round(cos(v, w) * 1e6)
        for s, v in src_rows
        for t, w in tgt_rows
    }
    def topk(side_id, is_src):
        items = [
            ((cmv, -other if False else other), other, cmv)
            for (s, t), cmv in cm.items()
            for other in [t if is_src else s]
            if (s if is_src else t) == side_id
        ]
        items.sort(key=lambda x: (-x[2], x[1]))
        return items[:k]

    exp = set()
    for s, _ in src_rows:
        bs = topk(s, True)
        best_t = bs[0][1]
        bt = topk(best_t, False)
        if bt[0][1] != s:
            continue
        sum_s, n_s = sum(x[2] for x in bs), len(bs)
        sum_t, n_t = sum(x[2] for x in bt), len(bt)
        cmv = cm[(s, best_t)]
        den = sum_s * n_t + sum_t * n_s
        if cmv <= 0 or den <= 0:
            continue
        margin = cmv * 2 * n_s * n_t * 1_000_000 // den
        if margin >= thr:
            exp.add((s, best_t, cmv, margin))
    got = {
        tuple(r)
        for r in margin_bitext_pairs(
            _df(spark, src_rows), _df(spark, tgt_rows), k=k,
            threshold_ppm=thr,
        ).collect()
    }
    assert got == exp and exp, "differential must be non-trivial"


def test_guard(spark):
    d = _df(spark, [(0, [1.0])])
    with pytest.raises(ValueError):
        margin_bitext_pairs(d, d, k=0)


def test_candidate_tier_matches_exact_on_clean_pairs(spark):
    # 20 well-separated planted translation pairs across 4 clusters:
    # the composed IVF tier (explicit centroids, sources probing top-2
    # cells) must mine the same mutual-best pairs the exact tier does,
    # with identical cos_micro/margin_ppm on the shared pairs.
    from horus_spark.operators.bitext import ivf_bitext_candidates

    import hashlib

    def vec(cluster, jitter):
        base = [0.0] * 8
        base[cluster * 2] = 1.0
        h = hashlib.md5(str(jitter).encode()).digest()
        return [b + ((x % 20) - 10) / 200.0 for b, x in zip(base, h)]

    src_rows = [(i, vec(i % 4, i)) for i in range(20)]
    tgt_rows = [(100 + i, vec(i % 4, 1000 + i)) for i in range(20)]
    src = _df(spark, src_rows)
    tgt = _df(spark, tgt_rows)
    cents = [
        [1.0, 0, 0, 0, 0, 0, 0, 0.0],
        [0, 0, 1.0, 0, 0, 0, 0, 0.0],
        [0, 0, 0, 0, 1.0, 0, 0, 0.0],
        [0, 0, 0, 0, 0, 0, 1.0, 0.0],
    ]
    cand = ivf_bitext_candidates(
        src, tgt, n_centroids=4, n_probe=2, centroids=cents
    )
    composed = margin_bitext_pairs(
        src, tgt, k=3, threshold_ppm=1_000_000, candidates=cand
    )
    exact = margin_bitext_pairs(src, tgt, k=3, threshold_ppm=1_000_000)
    got = {tuple(r) for r in composed.collect()}
    want_pairs = {(r["src_id"], r["tgt_id"]) for r in exact.collect()}
    assert {(s, t) for s, t, *_ in got} == want_pairs and want_pairs

    # the scale contract: NO cross/broadcast-nested-loop join anywhere
    plan = composed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_candidate_tier_background_is_candidate_local(spark):
    # restricting candidates changes the kNN background (CCMatrix
    # semantics: margin over the APPROXIMATE neighborhood) — a pair
    # whose competitors are excluded from the candidate set must still
    # be mined, proving the background sums never consult non-candidate
    # pairs.
    src = _df(spark, [(0, [1.0, 0.05, 0.0]), (1, [0.9, 0.1, 0.0])])
    tgt = _df(spark, [(10, [1.0, 0.0, 0.0]), (11, [0.2, 0.9, 0.1])])
    cand = spark.createDataFrame(
        [(0, 10), (1, 11)], "src_id long, tgt_id long"
    )
    got = {
        (r["src_id"], r["tgt_id"])
        for r in margin_bitext_pairs(
            src, tgt, k=2, threshold_ppm=0, candidates=cand
        ).collect()
    }
    # with only one candidate per side, each pair is trivially mutual
    assert got == {(0, 10), (1, 11)}
