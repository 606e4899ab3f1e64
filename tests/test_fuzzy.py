"""SymSpell deletion-neighborhood matching (operators/fuzzy.py, q126)."""

import itertools

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.fuzzy import edit1_pairs, spelling_variants


def _tok(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["token"])


def _levenshtein(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_matches_brute_force(spark):
    words = [
        "receive", "recieve", "receive", "government", "goverment",
        "spark", "spar", "sparks", "spork", "alpha", "alpa", "aalpha",
        "xyz", "xz", "banana", "bananna",
    ]
    got = {
        (r["word_a"], r["word_b"])
        for r in edit1_pairs(_tok(spark, words)).collect()
    }
    expect = {
        (a, b)
        for a, b in itertools.combinations(sorted(set(words)), 2)
        if _levenshtein(a, b) <= 1
    }
    assert got == expect


def test_distance2_collision_filtered(spark):
    # "abX" and "aYb" share deletion variant "ab" but are distance 2 —
    # the variant join proposes them; the verify must kill them.
    got = edit1_pairs(_tok(spark, ["abX", "aYb"])).collect()
    assert got == []


def test_counts_aggregated(spark):
    toks = ["word"] * 7 + ["ord"]
    rows = edit1_pairs(_tok(spark, toks)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert {r["word_a"], r["word_b"]} == {"word", "ord"}
    assert {r["count_a"], r["count_b"]} == {7, 1}
    assert r["dist"] == 1


def test_max_len_prunes_long_tokens(spark):
    long_a = "x" * 30
    long_b = "x" * 29
    rows = edit1_pairs(_tok(spark, [long_a, long_b, "cat", "cta"])).collect()
    assert all(len(r["word_a"]) <= 20 and len(r["word_b"]) <= 20 for r in rows)


def test_spelling_variants_dominance(spark):
    toks = ["government"] * 50 + ["goverment"] * 2 + ["spark"] * 10 + ["spars"] * 9
    out = spelling_variants(_tok(spark, toks), dominance=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["variant"] == "goverment" and r["canonical"] == "government"
    assert r["variant_count"] == 2 and r["canonical_count"] == 50


def test_rejects_bad_max_len(spark):
    with pytest.raises(ValueError):
        edit1_pairs(_tok(spark, ["a"]), max_len=0)
