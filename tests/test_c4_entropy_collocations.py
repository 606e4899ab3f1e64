"""Tests for the round-4 corpus-cleaning / corpus-statistics additions:
C4 line-level cleaning, PMI collocations, char entropy, binary Hamming
ANN. Each mirrors its oracle (q79/q80/q81/q82) with hand-computed or
python-differential fixtures."""

import math
import re

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- C4 (q79)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_c4_line_stats_hand_fixture(spark):
    from horus_spark.operators.c4 import c4_line_stats

    text = "\n".join(
        [
            "this is a perfectly fine kept sentence .",          # keep
            "Please enable Cookies to continue browsing now .",   # junk (cookie)
            "ok .",                                               # short (<5 words)
            "this line has plenty of words but no punctuation",   # nopunct
            "does javascript count even with enough words here .",  # junk
            'a quoted sentence with five words here "',           # keep (")
        ]
    )
    out = c4_line_stats(_mk_docs(spark, [("d1", text)])).collect()[0]
    assert out["n_lines"] == 6
    assert out["n_kept"] == 2
    assert out["n_junk"] == 2
    assert out["n_short"] == 1
    assert out["n_nopunct"] == 1
    # precedence identity: every removed line counted under exactly one rule
    assert out["n_junk"] + out["n_short"] + out["n_nopunct"] == (
        out["n_lines"] - out["n_kept"]
    )
    assert out["cleaned"] == (
        "this is a perfectly fine kept sentence .\n"
        'a quoted sentence with five words here "'
    )
    assert out["doc_flagged"] is False


def test_c4_precedence_junk_wins(spark):
    # a junk-phrase line that is ALSO short and ALSO missing punctuation
    # counts only as junk
    from horus_spark.operators.c4 import c4_line_stats

    out = c4_line_stats(_mk_docs(spark, [("d1", "accept cookie")])).collect()[0]
    assert (out["n_junk"], out["n_short"], out["n_nopunct"]) == (1, 0, 0)
    assert out["n_kept"] == 0 and out["cleaned"] == ""


def test_c4_doc_flag_and_clean_decision(spark):
    from horus_spark.operators.c4 import c4_clean, c4_line_stats

    keep_line = "this is a perfectly fine kept sentence ."
    rows = [
        ("good", keep_line),
        ("lorem", keep_line + "\nlorem ipsum dolor sit amet ."),
        ("brace", keep_line + "\ntemplate { leftovers } in this long line ."),
        ("empty", "nothing survives here"),  # nopunct -> zero kept lines
    ]
    stats = {r["doc_id"]: r for r in c4_line_stats(_mk_docs(spark, rows)).collect()}
    assert stats["good"]["doc_flagged"] is False
    assert stats["lorem"]["doc_flagged"] is True
    assert stats["brace"]["doc_flagged"] is True
    assert stats["empty"]["n_kept"] == 0

    cleaned = {r["doc_id"]: r["text"] for r in c4_clean(_mk_docs(spark, rows)).collect()}
    assert set(cleaned) == {"good"}
    assert cleaned["good"] == keep_line

    with pytest.raises(ValueError, match="min_words"):
        c4_clean(_mk_docs(spark, rows), min_words=0)


# ----------------------------------------------------- collocations (q80)


def test_pmi_collocations_python_differential(spark):
    from horus_spark.operators.collocations import pmi_collocations

    rows = [
        ("d1", "new york is a big city and new york never sleeps"),
        ("d2", "san francisco and new york and san francisco again"),
        ("d3", "the city is big and the city is loud"),
        ("d4", "  "),
        ("d5", "single"),
    ]
    # python replica of the documented algorithm
    toks = {
        d: re.split(r"\s+", t.strip()) for d, t in rows if t.strip()
    }
    pair_counts, uni = {}, {}
    tot_t = tot_n = 0
    for t in toks.values():
        tot_t += len(t)
        tot_n += max(len(t) - 1, 0)
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    min_count = 2
    expected = {}
    for (a, b), c in pair_counts.items():
        if c < min_count:
            continue
        ratio = ((c * float(tot_t)) * float(tot_t)) / (
            (float(tot_n) * uni[a]) * uni[b]
        )
        expected[(a, b)] = (c, uni[a], uni[b], round(math.log(ratio) * 1e6) / 1e6)

    got = pmi_collocations(
        _mk_docs(spark, rows), min_count=min_count, top_k=50
    ).collect()
    assert {(r["w1"], r["w2"]) for r in got} == set(expected)
    for r in got:
        c, n1, n2, pmi = expected[(r["w1"], r["w2"])]
        assert (r["n_pair"], r["n_w1"], r["n_w2"]) == (c, n1, n2)
        assert r["pmi"] == pytest.approx(pmi, abs=2e-6)
    # ordered by association desc: 'san francisco' (always glued) must
    # outrank 'is a'-style chance pairs; ordering is pmi desc then words
    pmis = [r["pmi"] for r in got]
    assert pmis == sorted(pmis, reverse=True)
    assert got[0]["w1"] == "san" and got[0]["w2"] == "francisco"

    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(_mk_docs(spark, rows), min_count=0)


def test_pmi_top_k_truncates_deterministically(spark):
    from horus_spark.operators.collocations import pmi_collocations

    rows = [("d1", "a b a b a b c d c d c d")]
    full = pmi_collocations(_mk_docs(spark, rows), min_count=1, top_k=50).collect()
    top2 = pmi_collocations(_mk_docs(spark, rows), min_count=1, top_k=2).collect()
    assert [(r["w1"], r["w2"]) for r in top2] == [
        (r["w1"], r["w2"]) for r in full[:2]
    ]


# ----------------------------------------------------- char entropy (q81)


def test_char_entropy_hand_values(spark):
    from horus_spark.operators.textstats import char_entropy

    rows = [("two", "aabb"), ("four", "abcd"), ("one", "aaaa"), ("nil", "")]
    got = {r["doc_id"]: r for r in char_entropy(_mk_docs(spark, rows)).collect()}

    # two symbols at p=.5: term = round(.5*ln(.5)*1e6) = -346574 twice
    assert got["two"]["n_chars"] == 4 and got["two"]["n_distinct"] == 2
    assert got["two"]["entropy"] == pytest.approx(0.693148, abs=1e-9)
    # four symbols at p=.25: 4 * round(.25*ln(.25)*1e6) = -1386296
    assert got["four"]["n_distinct"] == 4
    assert got["four"]["entropy"] == pytest.approx(1.386296, abs=1e-9)
    # degenerate cases
    assert got["one"]["entropy"] == 0.0 and got["one"]["n_distinct"] == 1
    assert (got["nil"]["n_chars"], got["nil"]["n_distinct"], got["nil"]["entropy"]) == (
        0,
        0,
        0.0,
    )
    # the detector property: repeated template < natural mix < uniform mash
    assert got["one"]["entropy"] < got["two"]["entropy"] < got["four"]["entropy"]


def test_char_entropy_python_differential(spark):
    from horus_spark.operators.textstats import char_entropy

    texts = [
        ("d1", "the quick brown fox jumps over the lazy dog ."),
        ("d2", "aaaaaaaaab"),
        ("d3", "zzzz  zzzz  zzzz"),
    ]
    got = {r["doc_id"]: r for r in char_entropy(_mk_docs(spark, texts)).collect()}
    for doc_id, text in texts:
        n = len(text)
        micro = sum(
            round((text.count(c) / n) * math.log(text.count(c) / n) * 1e6)
            for c in set(text)
        )
        assert got[doc_id]["n_chars"] == n
        assert got[doc_id]["n_distinct"] == len(set(text))
        assert got[doc_id]["entropy"] == pytest.approx(-micro / 1e6, abs=1e-9)


# ----------------------------------------------------- hamming ANN (q82)


def test_binary_quantize_bit_packing(spark):
    from horus_spark.operators.similarity import binary_quantize

    # bit i of a 32-slice contributes 2^(i-1): only dim 3 positive -> 4
    v1 = [0.0] * 32
    v1[2] = 1.0
    # all 32 positive -> 2^32 - 1
    v2 = [0.5] * 32
    # 40 dims: second word packs dims 33..40 -> only dim 34 positive -> 2
    v3 = [-1.0] * 40
    v3[33] = 3.0
    df = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3)], "vec_id long, embedding array<float>"
    )
    got = {r["id"]: r["words"] for r in binary_quantize(df).collect()}
    assert got[1] == [4]
    assert got[2] == [2**32 - 1]
    assert got[3] == [0, 2]


def test_hamming_topk_matches_brute_force_on_clustered_data(spark):
    """Four well-separated sign-pattern clusters: every query's true
    cosine top-k lives in its own cluster, whose codes are Hamming-0
    from the query, so the candidate tier provably contains the truth
    and the reranked output must EQUAL brute force row-for-row."""
    from horus_spark.operators.similarity import brute_force_topk, hamming_topk

    dim, per_cluster = 64, 20
    patterns = []
    for p in range(4):
        patterns.append(
            [1.0 if ((i >> p) & 1) == 0 else -1.0 for i in range(dim)]
        )
    rows = []
    vid = 0
    for p, pat in enumerate(patterns):
        for j in range(per_cluster):
            # magnitude jitter that never crosses zero (signs exact)
            vec = [
                pat[i] * (1.0 + 0.01 * ((i * 7 + j * 13 + p) % 11))
                for i in range(dim)
            ]
            rows.append((vid, vec))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id").isin(0, 25, 70)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    brute = brute_force_topk(emb, q, k=10).collect()
    ham = hamming_topk(emb, q, k=10, rerank=3).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["q_id"], r["rank"], r["neighbor_id"], r["score"]) for r in brute]
    ) == sorted([(r["q_id"], r["rank"], r["neighbor_id"], r["score"]) for r in ham])
    # and the candidate tier did its job: 10 rows per query, ranks 1..10
    per_q = {}
    for r in ham:
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_c4_null_text_accounted_and_dropped(spark):
    """NULL text folds to "" — sane accounting (one short line, flag
    False) instead of size(NULL)=-1 counts and a NULL flag that would
    silently vanish from c4_clean's negated filter."""
    from horus_spark.operators.c4 import c4_clean, c4_line_stats

    docs = spark.createDataFrame(
        [("d1", None), ("d2", "This line is long enough to keep fine.")],
        "doc_id string, text string",
    )
    s = {r["doc_id"]: r for r in c4_line_stats(docs).collect()}
    assert s["d1"]["n_lines"] == 1
    assert s["d1"]["n_short"] == 1
    assert s["d1"]["doc_flagged"] is False
    assert s["d1"]["cleaned"] == ""
    kept = c4_clean(docs).collect()
    assert [r["doc_id"] for r in kept] == ["d2"]
