"""Unigram LM quality scoring (q57 unit)."""

import math

import pytest


def _expected_self_fit(docs, alpha=1.0):
    toks = {d: t.split() for d, t in docs.items() if t.strip()}
    counts: dict[str, int] = {}
    for t in toks.values():
        for w in t:
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    vocab = len(counts)
    out = {}
    for d, t in toks.items():
        micro = sum(
            round(math.log((counts[w] + alpha) / (total + alpha * (vocab + 1))) * 1e6)
            for w in t
        )
        out[d] = (len(t), round(micro / (len(t) * 1e6), 6), 0)
    for d, t in docs.items():
        if not t.strip():
            out[d] = (0, 0.0, 0)
    return out


def test_lm_score_self_fit_differential(spark):
    from horus_spark.operators.lm_score import lm_score

    docs = {
        "d1": "the cat sat on the mat",
        "d2": "the the the the",
        "d3": "zzz qqq xxx",  # rare tokens -> lowest mean logp
        "d4": "",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_logp"], r["n_oov"])
        for r in lm_score(df).collect()
    }
    assert got == _expected_self_fit(docs)
    # common-token doc scores higher than rare-token doc
    assert got["d2"][1] > got["d3"][1]


def test_lm_score_reference_model_oov(spark):
    # scoring against a model fit on a DIFFERENT corpus: unseen tokens
    # take the reserved smoothing mass and are counted as OOV
    from horus_spark.operators.lm_score import fit_unigram_model, lm_score

    ref = spark.createDataFrame(
        [("r1", "alpha beta gamma alpha")], "doc_id string, text string"
    )
    model = fit_unigram_model(ref)
    df = spark.createDataFrame(
        [("d1", "alpha beta"), ("d2", "unknown words only")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_logp"], r["n_oov"])
        for r in lm_score(df, model=model).collect()
    }
    assert got["d1"][2] == 0
    assert got["d2"] == (3, got["d2"][1], 3)
    # OOV logp = ln(alpha / (total + alpha*(vocab+1))) = ln(1/8)
    assert got["d2"][1] == round(round(math.log(1 / 8) * 1e6) / 1e6, 6)
    # all-OOV doc scores below the in-vocab doc
    assert got["d2"][1] < got["d1"][1]


def test_lm_score_partitioning_invariant(spark):
    # exact long summation: same mean at any parallelism
    from horus_spark.operators.lm_score import lm_score

    rows = [(f"d{i}", " ".join(f"w{j % 13}" for j in range(i % 40 + 1))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    one = sorted(map(tuple, lm_score(df.coalesce(1)).collect()))
    many = sorted(map(tuple, lm_score(df.repartition(16)).collect()))
    assert one == many


def test_ccnet_tiers_rank_cut_and_coverage(spark):
    from horus_spark.operators.lm_score import ccnet_tiers

    # 9 docs with clearly separated scores: common tokens rank higher
    # under the self-fit unigram model than rare ones
    docs = [(f"d{i}", " ".join(["common"] * 5 + [f"rare{i}"] * i)) for i in range(9)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = ccnet_tiers(df).collect()
    assert len(rows) == 9
    tiers = {r["doc_id"]: r["tier"] for r in rows}
    from collections import Counter

    assert Counter(tiers.values()) == {"head": 3, "middle": 3, "tail": 3}
    # the rank order must follow mean_logp descending with id tie-break
    by_score = sorted(rows, key=lambda r: (-r["mean_logp"], r["doc_id"]))
    seen = [r["tier"] for r in by_score]
    assert seen == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_ccnet_tiers_uneven_counts(spark):
    from collections import Counter

    from horus_spark.operators.lm_score import ccnet_tiers

    df = spark.createDataFrame(
        [(f"d{i}", f"tok{i} tok{i}") for i in range(7)],
        "doc_id string, text string",
    )
    tiers = Counter(r["tier"] for r in ccnet_tiers(df).collect())
    # ((rank-1)*3) div 7: ranks 1-3 head, 4-5 middle, 6-7 tail
    assert tiers == {"head": 3, "middle": 2, "tail": 2}
