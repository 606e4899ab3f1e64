"""Round-4 curation operators: DSIR importance weights, sliding-window
duplicate-span coverage, temperature mixture allocation, Gopher quality
gate. Each is differential-tested against an independent python replay
or hand-computed fixtures (the oracle gate covers SQL parity; these pin
the semantics on planted corpora)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return {r[0]: r for r in df.collect()}


# ------------------------------------------------------------------ DSIR


def _py_md5_bucket(feat: str, salt: str, n_buckets: int) -> int:
    return int(hashlib.md5((feat + salt).encode()).hexdigest()[:15], 16) % n_buckets


def _py_dsir(docs, target_ids, n_buckets=64, alpha=1.0, salt="dsir"):
    """Independent replay of dsir_log_weights: hashed unigram+bigram
    buckets, Laplace models, micro-int log-ratio accumulation."""
    def feats(text):
        toks = text.strip().split()
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    doc_buckets = {}
    for did, text in docs.items():
        counts = {}
        if text.strip():
            for f_ in feats(text):
                b = _py_md5_bucket(f_, salt, n_buckets)
                counts[b] = counts.get(b, 0) + 1
        doc_buckets[did] = counts

    def model(ids):
        cb = {}
        for did in ids:
            for b, c in doc_buckets[did].items():
                cb[b] = cb.get(b, 0) + c
        total = float(sum(cb.values()))
        den = total + alpha * n_buckets
        return cb, den

    raw_cb, raw_den = model(docs.keys())
    tgt_cb, tgt_den = model(target_ids)
    out = {}
    for did, counts in doc_buckets.items():
        acc = 0
        for b, c in counts.items():
            lt = math.log((tgt_cb.get(b, 0) + alpha) / tgt_den)
            lr = math.log((raw_cb.get(b, 0) + alpha) / raw_den)
            acc += c * round((lt - lr) * 1e6)
        out[did] = (sum(counts.values()), round(acc / 1e6, 6))
    return out


def test_dsir_matches_python_replay(spark):
    from horus_spark.operators.dsir import dsir_log_weights

    docs = {
        "a": "the cat sat on the mat",
        "b": "cat mat cat mat the cat",
        "c": "quarterly revenue grew nine percent",
        "d": "revenue fell despite growth in cloud revenue",
        "e": "",
        "f": "the cat read quarterly revenue",
    }
    target = {"a", "b"}
    df = spark.createDataFrame(
        [(k, v, "en" if k in target else "de") for k, v in docs.items()],
        "doc_id string, text string, lang string",
    )
    got = _rows(
        dsir_log_weights(df, F.col("lang") == "en", n_buckets=64)
    )
    want = _py_dsir(docs, target, n_buckets=64)
    assert set(got) == set(docs)
    for did, (n_feats, lw) in want.items():
        assert got[did]["n_feats"] == n_feats, did
        assert got[did]["log_weight"] == pytest.approx(lw, abs=2e-6), did
    # target-like docs must outscore off-target docs
    assert got["a"]["log_weight"] > got["c"]["log_weight"]
    assert got["b"]["log_weight"] > got["d"]["log_weight"]
    # empty doc scores 0 with a retained row
    assert got["e"]["n_feats"] == 0 and got["e"]["log_weight"] == 0.0


# -------------------------------------------------- duplicate span coverage


def test_duplicate_span_coverage_interval_union(spark):
    from horus_spark.operators.paragraphs import duplicate_span_coverage

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    df = spark.createDataFrame(
        [
            ("a", shared + " unique1 unique2"),          # shares 6-token prefix
            ("b", "pre1 pre2 " + shared),                # same 6 tokens, shifted
            ("c", "totally different words here now ok"),
            ("d", "tiny doc"),                           # < window tokens
            ("e", ""),
        ],
        "doc_id string, text string",
    )
    got = _rows(duplicate_span_coverage(df, window=4))
    # doc a: tokens 0..5 shared -> dup windows at pos 0,1,2 (4-token
    # sliding), union covers tokens 0..5 = 6 of 8 tokens
    assert got["a"]["n_tokens"] == 8 and got["a"]["n_windows"] == 5
    assert got["a"]["n_dup_windows"] == 3
    assert got["a"]["covered_tokens"] == 6
    assert got["a"]["dup_frac"] == pytest.approx(0.75)
    # doc b: same shared run at offset 2 -> positions 2,3,4; coverage 6/8
    assert got["b"]["n_dup_windows"] == 3 and got["b"]["covered_tokens"] == 6
    # c: no cross-doc window
    assert got["c"]["n_dup_windows"] == 0 and got["c"]["covered_tokens"] == 0
    # d: too short for any window, but n_tokens recorded
    assert got["d"]["n_tokens"] == 2 and got["d"]["n_windows"] == 0
    assert got["e"]["n_tokens"] == 0 and got["e"]["dup_frac"] == 0.0


def test_duplicate_span_coverage_merges_overlaps_not_hits(spark):
    from horus_spark.operators.paragraphs import duplicate_span_coverage

    # 10 identical tokens in both docs: 7 dup windows but coverage = 10
    # tokens, NOT 7*4=28 — the interval union is what's counted
    text = " ".join(["tok"] * 10)
    df = spark.createDataFrame(
        [("a", text), ("b", text + " tail1 tail2")],
        "doc_id string, text string",
    )
    got = _rows(duplicate_span_coverage(df, window=4))
    assert got["a"]["n_dup_windows"] == 7
    assert got["a"]["covered_tokens"] == 10
    assert got["a"]["dup_frac"] == pytest.approx(1.0)


# ------------------------------------------------------ temperature mixture


def test_temperature_mixture_hand_math(spark):
    from horus_spark.operators.mixture import temperature_mixture

    # domain x: 3 docs x 4 tokens = 12; domain y: 1 doc x 4 tokens = 4
    rows = [("x", "a b c d")] * 3 + [("y", "a b c d")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = _rows(temperature_mixture(df, alpha=0.5, token_budget=1000))
    wx = round(math.sqrt(12 / 16) * 1e9)
    wy = round(math.sqrt(4 / 16) * 1e9)
    assert got["x"]["n_tokens"] == 12 and got["y"]["n_tokens"] == 4
    assert got["x"]["p_raw"] == pytest.approx(0.75)
    assert got["x"]["p_mix"] == pytest.approx(round(wx / (wx + wy), 6))
    assert got["x"]["target_tokens"] == round(1000 * wx / (wx + wy))
    assert got["y"]["epochs"] == pytest.approx(
        round(1000 * wy / (wx + wy) / 4, 6)
    )
    # temperature alpha<1 flattens: y's mixture share exceeds its raw share
    assert got["y"]["p_mix"] > got["y"]["p_raw"]
    # shares sum to ~1, allocations to ~budget
    assert got["x"]["p_mix"] + got["y"]["p_mix"] == pytest.approx(1.0, abs=1e-5)


# ------------------------------------------------------------ quality gate


def test_gopher_rules_each_fire(spark):
    from horus_spark.operators.quality_filter import gopher_quality_filter

    good = "the results have improved and we expect that growth to continue"
    cases = [
        ("good", good, None),
        ("short", "too few words", "r_word_count"),
        ("longwords", "the unquestionably extraordinarily incomprehensible "
                      "antidisestablishmentarianism of counterrevolutionaries "
                      "with internationalization", "r_mean_wlen"),
        ("symbols", "the #tag of #spam and #junk that #have #with #more #tags",
         "r_symbol"),
        ("bullets", "- the one\n- of two\n- and three\n- that four\n- have five",
         "r_bullet"),
        ("ellipsis", "the start of it...\nand more to come...\nthat end...",
         "r_ellipsis"),
        ("numeric", "the 111 222 333 444 555 666 777 888 999 000 and 1 2 3 of",
         "r_alpha"),
        ("nostop", "quarterly revenue grew nine percent across cloud segments",
         "r_stopwords"),
    ]
    df = spark.createDataFrame(
        [(n, t) for n, t, _ in cases], "doc_id string, text string"
    )
    got = _rows(gopher_quality_filter(df))
    assert got["good"]["keep"] is True
    for name, _, rule in cases:
        if rule is None:
            continue
        assert got[name][rule] is False, (name, rule, got[name])
        assert got[name]["keep"] is False, name


def test_gopher_filter_plan_is_map_side(spark):
    from horus_spark.operators.quality_filter import gopher_quality_filter

    df = spark.createDataFrame([("a", "the cat"), ], "doc_id string, text string")
    plan = gopher_quality_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dsir_empty_target_fails_loudly(spark):
    # an empty target slice previously NULLed every ratio and the final
    # coalesce emitted log_weight 0.0 for every doc — a silent uniform
    # sampler; it must raise instead
    from horus_spark.operators.dsir import dsir_log_weights

    df = spark.createDataFrame(
        [("d1", "hello world", "en"), ("d2", "foo bar", "de")],
        "doc_id string, text string, lang string",
    )
    out = dsir_log_weights(df, F.col("lang") == "zz", n_buckets=64)
    with pytest.raises(Exception) as exc:
        out.collect()
    assert "is_target matched zero rows" in str(exc.value)


def test_bigram_lm_backoff_hand_math(spark):
    """Hand-computed interpolated-backoff values on a 4-token reference:
    ref='a b a c' -> c12(a,b)=1, c1(a)=2, unigrams a:2 b:1 c:1
    (total=4, vocab=3, Laplace denom = 8)."""
    import math

    from horus_spark.operators.lm_score import bigram_lm_score

    ref = spark.createDataFrame([("r1", "a b a c")], "doc_id string, text string")
    docs = spark.createDataFrame(
        [
            ("d1", "a b"),   # seen bigram: .5*(1/2) + .5*(2/8) = 0.375
            ("d2", "b c"),   # unseen bigram, seen unigram: .5*(2/8) = 0.125
            ("d3", "z q"),   # unseen everything: .5*(1/8) = 0.0625
            ("d4", "a"),     # single token: no bigrams
            ("d5", None),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in bigram_lm_score(docs, ref=ref).collect()
    }

    def micro_mean(p):
        return round(round(math.log(p) * 1e6) / 1e6, 6)

    assert got["d1"]["n_bigrams"] == 1 and got["d1"]["n_unseen"] == 0
    assert got["d1"]["mean_logp"] == pytest.approx(micro_mean(0.375), abs=1e-9)
    assert got["d2"]["n_unseen"] == 1
    assert got["d2"]["mean_logp"] == pytest.approx(micro_mean(0.125), abs=1e-9)
    assert got["d3"]["n_unseen"] == 1
    assert got["d3"]["mean_logp"] == pytest.approx(micro_mean(0.0625), abs=1e-9)
    assert got["d4"]["n_bigrams"] == 0 and got["d4"]["mean_logp"] == 0.0
    assert got["d5"]["n_bigrams"] == 0 and got["d5"]["mean_logp"] == 0.0
    # fluent order scores above the same tokens transposed (transition
    # plausibility is the entire point of the bigram tier)
    assert got["d1"]["mean_logp"] > got["d2"]["mean_logp"] > got["d3"]["mean_logp"]

    # self-fit: every scored bigram is in the model by construction
    self_fit = bigram_lm_score(docs.filter("text is not null"))
    assert all(r["n_unseen"] == 0 for r in self_fit.collect())

    with pytest.raises(ValueError, match="lam"):
        bigram_lm_score(docs, lam=1.0)
