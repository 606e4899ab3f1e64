"""BPE training/apply vs a pure-Python Sennrich reference.

The reference implementation here is the textbook algorithm (word
frequency dict; per round count all adjacent pairs weighted by word
count, take the argmax with (count desc, pair asc) tie-break, then
greedy left-to-right single-pass merge in every word). The Spark side
must reproduce it bit-exactly — same merges, same counts, same final
segmentations.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.bpe import bpe_segment, bpe_train


def _py_train(word_counts: dict, n_merges: int, eow: str = "</w>"):
    st = {w: list(w) + ([eow] if eow else []) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, c in word_counts.items():
            s = st[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((l, r, c))
        for w in st:
            out, carry = [], None
            for x in st[w]:
                if carry is None:
                    carry = x
                elif carry == l and x == r:
                    out.append(l + r)
                    carry = None
                else:
                    out.append(carry)
                    carry = x
            if carry is not None:
                out.append(carry)
            st[w] = out
    return merges, st


CORPUS = [
    (0, "low low lower lowest aaaa"),
    (1, "newer newest low aaaa aaaa"),
    (2, "aaaaa banana bandana low"),
    (3, "newer newer newer lowest"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_bpe_train_matches_python_reference(docs):
    wf = Counter(w for _, t in CORPUS for w in t.split())
    expected, _ = _py_train(dict(wf), 6)
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_bpe_self_pair_merges_at_even_offsets(spark):
    # "aaaa" must merge to [aa, aa]; "aaaaa" to [aa, aa, a</w>]-ish
    # depending on later merges — round 1 on this corpus is (a, a).
    d = spark.createDataFrame([(0, "aaaa aaaa aaaaa")], ["doc_id", "text"])
    m = bpe_train(d, n_merges=1).collect()[0]
    assert (m["left"], m["right"]) == ("a", "a")
    seg = {
        r["word"]: list(r["tokens"])
        for r in bpe_segment(d, [m]).collect()
    }
    assert seg["aaaa"] == ["aa", "aa", "</w>"]
    assert seg["aaaaa"] == ["aa", "aa", "a", "</w>"]


def test_bpe_segment_matches_python_reference(docs):
    wf = Counter(w for _, t in CORPUS for w in t.split())
    _, st = _py_train(dict(wf), 6)
    merges = bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    seg = bpe_segment(docs, merges)
    got = {r["word"]: list(r["tokens"]) for r in seg.collect()}
    assert got == st


def test_bpe_no_eow(docs):
    wf = Counter(w for _, t in CORPUS for w in t.split())
    expected, _ = _py_train(dict(wf), 3, eow="")
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=3, eow="").orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_bpe_train_rejects_zero_merges(docs):
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=0)


def test_bpe_segment_positions_cover_doc(docs):
    merges = bpe_train(docs, n_merges=2).collect()
    seg = bpe_segment(docs, merges)
    n_words = seg.groupBy("id").agg(F.count("*").alias("n")).collect()
    expect = {i: len(t.split()) for i, t in CORPUS}
    assert {r["id"]: r["n"] for r in n_words} == expect
