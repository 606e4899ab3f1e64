"""Content-defined chunking: python boundary/digest replay, the
shift-resistance property (insertion upstream preserves downstream
chunk digests), short/blank docs, dup-stats math, guards."""

import hashlib

import pytest

from horus_spark.operators.cdc import cdc_chunks, cdc_dup_stats

K, D = 3, 4


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _norm(t: str) -> str:
    import re

    t = re.sub(r"\s+", " ", t.lower())
    t = re.sub(r"[^a-z0-9 ]", "", t)
    return re.sub(r" +", " ", t).strip()


def _py_chunks(text: str, k=K, d=D):
    toks = _norm(text).split(" ")
    if not any(toks):
        return []
    n = len(toks)
    bpos = [
        i
        for i in range(k - 1, n - 1)
        if _h(" ".join(toks[i - k + 1 : i + 1])) % d == 0
    ]
    starts = [0] + [p + 1 for p in bpos]
    ends = bpos + [n - 1]
    out = []
    for idx, (s, e) in enumerate(zip(starts, ends)):
        chunk = " ".join(toks[s : e + 1])
        out.append((idx, e - s + 1, hashlib.md5(chunk.encode()).hexdigest()))
    return out


TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm mat and the bird sings in the tall tree near the old "
    "river bank under a pale morning sky"
)


def test_python_replay(spark):
    df = spark.createDataFrame([(1, TEXT)], "doc_id long, text string")
    got = sorted(
        (r.chunk_idx, r.n_tokens, r.digest)
        for r in cdc_chunks(df, k=K, divisor=D).collect()
    )
    assert got == sorted(_py_chunks(TEXT))
    assert len(got) > 2  # the fixture genuinely chunks


def test_shift_resistance(spark):
    inserted = TEXT.replace(
        "while the cat", "EXTRA WORDS INSERTED HERE while the cat"
    )
    df = spark.createDataFrame(
        [(1, TEXT), (2, inserted)], "doc_id long, text string"
    )
    chunks = cdc_chunks(df, k=K, divisor=D)
    d1 = {r.digest for r in chunks.filter("id = 1").collect()}
    d2 = {r.digest for r in chunks.filter("id = 2").collect()}
    shared = d1 & d2
    # downstream chunks resynchronize after the insertion -> shared
    # digests survive; fixed-width chunking would share nothing
    assert len(shared) >= 1
    # and the edited region itself differs
    assert d1 != d2


def test_short_and_blank_docs(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    got = cdc_chunks(df, k=K, divisor=D).collect()
    assert len(got) == 1  # doc 1: single chunk; blanks emit nothing
    assert (got[0].id, got[0].chunk_idx, got[0].n_tokens) == (1, 0, 2)


def test_dup_stats(spark):
    inserted = TEXT.replace(
        "while the cat", "EXTRA WORDS INSERTED HERE while the cat"
    )
    df = spark.createDataFrame(
        [(1, TEXT), (2, inserted), (3, "completely unrelated words here")],
        "doc_id long, text string",
    )
    stats = {
        r.id: r
        for r in cdc_dup_stats(cdc_chunks(df, k=K, divisor=D)).collect()
    }
    assert stats[1].n_dup_chunks >= 1
    assert 0 < stats[1].dup_token_ppm <= 1_000_000
    assert stats[3].n_dup_chunks == 0 and stats[3].dup_token_ppm == 0
    # exact arithmetic: ppm = dup_tokens * 1e6 // tokens
    r = stats[1]
    chunks1 = [
        (c.n_tokens, c.digest)
        for c in cdc_chunks(df, k=K, divisor=D).filter("id = 1").collect()
    ]
    dup_digests = {
        c.digest
        for c in cdc_chunks(df, k=K, divisor=D).filter("id = 2").collect()
    }
    dup_toks = sum(n for n, dg in chunks1 if dg in dup_digests)
    assert r.dup_token_ppm == dup_toks * 1_000_000 // r.n_tokens


def test_guards(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc_chunks(df, k=0)
    with pytest.raises(ValueError):
        cdc_chunks(df, divisor=1)
