"""BM25 ranking + token-window chunking (q52/q53 units)."""

import math

import pytest
from pyspark.sql import functions as F


def _bm25_python(docs, query_terms, k1=1.2, b=0.75):
    """Independent driver-side BM25 for differential checking."""
    toks = {d: t.split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in query_terms
    }
    out = {}
    for d, t in toks.items():
        s, matched = 0.0, 0
        for q in query_terms:
            tf = t.count(q)
            if tf == 0 or df[q] == 0:
                continue
            matched += 1
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if matched:
            out[d] = (round(s, 6), matched)
    return out


def test_bm25_differential(spark):
    from horus_spark.operators.ranking import bm25_topk

    docs = {
        "d1": "spark joins data with hash joins and window functions",
        "d2": "the quick brown fox jumps over the lazy dog",
        "d3": "hash hash hash everywhere hash",
        "d4": "window window spark",
        "d5": "completely unrelated text about gardening tools",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    got = {
        r["doc_id"]: (r["score"], r["n_matched_terms"])
        for r in bm25_topk(df, "spark hash window", k=10).collect()
    }
    exp = _bm25_python(docs, ["spark", "hash", "window"])
    assert got == exp
    # docs with zero matching terms never appear
    assert "d2" not in got and "d5" not in got


def test_bm25_topk_truncation_and_tiebreak(spark):
    from horus_spark.operators.ranking import bm25_topk

    # identical docs -> identical scores -> deterministic id tie-break
    df = spark.createDataFrame(
        [(f"d{i:02d}", "alpha beta") for i in range(9, -1, -1)],
        "doc_id string, text string",
    )
    rows = bm25_topk(df, "alpha", k=3).collect()
    assert [r["doc_id"] for r in rows] == ["d00", "d01", "d02"]
    assert len({r["score"] for r in rows}) == 1


def test_bm25_rejects_empty_query(spark):
    from horus_spark.operators.ranking import bm25_topk

    df = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "!!! ???")


def test_normalize_query():
    from horus_spark.operators.ranking import normalize_query

    assert normalize_query("Spark, HASH-join!  window window") == [
        "spark",
        "hashjoin",
        "window",
    ]


def test_chunk_documents_windows(spark):
    from horus_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [
            ("d1", "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            ("d2", "a b"),  # shorter than window
            ("d3", ""),  # empty -> no rows
            ("d4", "   "),  # whitespace -> no rows
        ],
        "doc_id string, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, window=4, stride=3).collect()
    }
    assert rows == {
        ("d1", 0): (4, "t0 t1 t2 t3"),
        ("d1", 1): (4, "t3 t4 t5 t6"),
        ("d1", 2): (4, "t6 t7 t8 t9"),
        ("d1", 3): (1, "t9"),
        ("d2", 0): (2, "a b"),
    }


def test_chunk_exact_multiple_no_empty_tail(spark):
    from horus_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [("d", "a b c d e f")], "doc_id string, text string"
    )
    rows = chunk_documents(df, window=3, stride=3).collect()
    assert [(r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in sorted(
        rows, key=lambda r: r["chunk_id"]
    )] == [(0, 3, "a b c"), (1, 3, "d e f")]


def test_chunk_plan_is_shuffle_free(spark):
    from horus_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [("d", "a b c d e f")], "doc_id string, text string"
    )
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_rejects_bad_params(spark):
    from horus_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, window=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)
