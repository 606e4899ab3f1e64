"""HLL distinct sketch, RRF fusion, TF-IDF cosine pairs (q83/q84/q85)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _md5_long(s: str, salt: str = "") -> int:
    return int(hashlib.md5((s + salt).encode()).hexdigest()[:15], 16)


def _hll_py(values, p=6):
    """Driver-side replay of sketches.hll_distinct for one group."""
    m = 1 << p
    rem = 60 - p
    regs = {}
    for v in values:
        h = _md5_long(v, "sX")
        reg, rest = h >> rem, h & ((1 << rem) - 1)
        rho = (rem + 1) if rest == 0 else (rem + 1 - rest.bit_length())
        regs[reg] = max(regs.get(reg, 0), rho)
    vcnt = len(regs)
    s_int = sum(1 << (rem + 1 - r) for r in regs.values())
    s = s_int / float(1 << (rem + 1))
    alpha = 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m)
    n_empty = m - vcnt
    e_raw = alpha * m * m / (s + n_empty)
    if e_raw <= 2.5 * m and n_empty > 0:
        est = m * math.log(m / n_empty)
    else:
        est = e_raw
    return vcnt, round(est, 4)


def test_hll_python_replay_and_accuracy(spark):
    from horus_spark.operators.sketches import hll_distinct

    rows = [("g", f"value-{i % 700}") for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, v string")
    got = hll_distinct(df, ["grp"], "v", p=6, salt="sX").collect()[0]
    exp_hits, exp_est = _hll_py([f"value-{i}" for i in range(700)])
    assert got["n_registers_hit"] == exp_hits
    assert got["est_distinct"] == pytest.approx(exp_est, abs=1e-9)
    # HLL at m=64 has ~13% relative error; 700 true distincts
    assert 400 < got["est_distinct"] < 1100


def test_hll_partitioning_invariance(spark):
    from horus_spark.operators.sketches import hll_distinct

    rows = [(("a" if i % 3 else "b"), f"t{i % 97}") for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, v string")
    one = sorted(
        hll_distinct(df.coalesce(1), ["grp"], "v", p=6).collect(),
        key=lambda r: r["grp"],
    )
    many = sorted(
        hll_distinct(df.repartition(16), ["grp"], "v", p=6).collect(),
        key=lambda r: r["grp"],
    )
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_hll_small_range_linear_counting(spark):
    # 3 distincts in 64 registers -> linear-counting branch, near-exact.
    from horus_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [("g", "x"), ("g", "y"), ("g", "z"), ("g", "x")], "grp string, v string"
    )
    got = hll_distinct(df, ["grp"], "v", p=6).collect()[0]
    assert got["n_registers_hit"] <= 3
    assert 1.0 <= got["est_distinct"] < 10.0


def test_hll_p_guard(spark):
    from horus_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame([("g", "x")], "grp string, v string")
    with pytest.raises(ValueError):
        hll_distinct(df, ["grp"], "v", p=3)


def test_rrf_hand_computed(spark):
    from horus_spark.operators.ranking import rrf_fuse

    l1 = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "id string, rank int"
    )
    l2 = spark.createDataFrame(
        [("b", 1), ("a", 2), ("d", 3)], "id string, rank int"
    )
    got = {
        r["id"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([l1, l2], k=60).collect()
    }
    assert got["a"] == (round(1 / 61 + 1 / 62, 6), 2)
    assert got["b"] == (round(1 / 62 + 1 / 61, 6), 2)
    assert got["c"] == (round(1 / 63, 6), 1)
    assert got["d"] == (round(1 / 63, 6), 1)
    # two-list members outrank single-list members at these depths
    assert got["a"][0] > got["c"][0]


def test_rrf_topk_tie_break(spark):
    from horus_spark.operators.ranking import rrf_fuse

    l1 = spark.createDataFrame(
        [("z", 1), ("y", 2)], "id string, rank int"
    )
    l2 = spark.createDataFrame(
        [("y", 1), ("z", 2)], "id string, rank int"
    )
    # y and z tie exactly -> id ascending decides
    rows = rrf_fuse([l1, l2], topk=1).collect()
    assert [r["id"] for r in rows] == ["y"]


def test_rrf_guards(spark):
    from horus_spark.operators.ranking import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
    df = spark.createDataFrame([("a", 1)], "id string, rank int")
    with pytest.raises(ValueError):
        rrf_fuse([df], k=0)


def _tfidf_py(docs, max_df=50):
    """Driver-side replay of tfidf_cosine_pairs (pre-normalized text)."""
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    tf = {i: {} for i in docs}
    for i, ts in toks.items():
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    dfc = {}
    for i in docs:
        for t in tf[i]:
            dfc[t] = dfc.get(t, 0) + 1
    kept = {t for t, c in dfc.items() if 2 <= c <= max_df}
    w = {
        i: {
            t: c * (math.log((n + 1) / (dfc[t] + 1)) + 1)
            for t, c in tf[i].items()
            if t in kept
        }
        for i in docs
    }
    out = {}
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            na = math.sqrt(sum(v * v for v in w[a].values()))
            nb = math.sqrt(sum(v * v for v in w[b].values()))
            out[(a, b)] = round(dot / (na * nb), 6)
    return out


def test_tfidf_python_differential(spark):
    from horus_spark.operators.tfidf import tfidf_cosine_pairs

    docs = {
        "d1": "spark runs fast queries on big data",
        "d2": "spark runs fast queries on small data",
        "d3": "ducks swim on the pond in spring",
        "d4": "ducks swim on the lake in spring",
        "d5": "completely unrelated singleton words here",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    got = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in tfidf_cosine_pairs(df, threshold=0.05).collect()
    }
    exp = {k: v for k, v in _tfidf_py(docs).items() if v >= 0.05}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=2e-6)
    # the near-identical pairs dominate
    assert got[("d1", "d2")] > 0.5 and got[("d3", "d4")] > 0.5
    # d5 shares no non-singleton term with anyone -> never materializes
    assert not any("d5" in k for k in got)


def test_tfidf_hot_term_pruned(spark):
    # a term in EVERY doc (df > max_df) must not create pairs by itself
    from horus_spark.operators.tfidf import tfidf_cosine_pairs

    rows = [(f"d{i}", f"common unique{i} filler{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = tfidf_cosine_pairs(df, threshold=0.01, max_df=5).collect()
    assert got == []  # 'common' has df=6 > 5; all other terms are singletons


def test_tfidf_guards(spark):
    from horus_spark.operators.tfidf import tfidf_cosine_pairs

    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, threshold=0.0)
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, max_df=1)
