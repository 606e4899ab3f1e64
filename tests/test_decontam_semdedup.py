"""Edge-case coverage for decontaminate / semantic_dedup / top_ngrams
(full Spark-vs-DuckDB parity runs under the q47/q48/q49 oracle gate)."""

import pytest
from pyspark.sql import functions as F


def test_shingle_array_short_docs_no_error(spark):
    # docs shorter than n tokens used to raise INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    # under ANSI mode (sequence(0, size-n) descends past the array); they
    # must yield an empty shingle set instead.
    from horus_spark.operators.dedup import _shingle_array

    df = spark.createDataFrame(
        [("a", "one two"), ("b", ""), ("c", "one two three four"), ("d", "   ")],
        "doc_id string, text string",
    )
    rows = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(_shingle_array("text", 3)).alias("n")
        ).collect()
    }
    assert rows == {"a": 0, "b": 0, "c": 2, "d": 0}


def test_decontaminate_flags_and_fractions(spark):
    from horus_spark.operators.decontam import decontaminate

    corpus = spark.createDataFrame(
        [
            # shares the benchmark's "quick brown fox" trigram (after
            # normalization strips case + punctuation)
            ("c1", "The QUICK, brown fox! jumps high today"),
            # no overlap
            ("c2", "completely different words in this document here"),
            # shorter than n tokens -> zero shingles, never flagged
            ("c3", "tiny doc"),
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [("b1", "quick brown fox leaps")], "doc_id string, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(corpus, bench, n=3, normalize=True).collect()
    }
    assert out["c1"]["is_contaminated"] and out["c1"]["n_collisions"] == 1
    assert out["c1"]["n_shingles"] == 5  # 7 normalized tokens -> 5 trigrams
    assert out["c1"]["contam_frac"] == pytest.approx(0.2)
    assert not out["c2"]["is_contaminated"] and out["c2"]["n_collisions"] == 0
    assert out["c3"]["n_shingles"] == 0 and not out["c3"]["is_contaminated"]
    assert out["c3"]["contam_frac"] == 0.0

    # without normalization the case/punct differences hide the overlap
    raw = {
        r["doc_id"]: r["is_contaminated"]
        for r in decontaminate(corpus, bench, n=3, normalize=False).collect()
    }
    assert not raw["c1"]

    # min_collisions raises the evidence bar
    strict = {
        r["doc_id"]: r["is_contaminated"]
        for r in decontaminate(corpus, bench, n=3, min_collisions=2).collect()
    }
    assert not strict["c1"]


def test_semantic_dedup_groups_and_transitivity(spark):
    from horus_spark.operators.semdedup import semantic_dedup, semantic_pairs

    # axis-aligned cells: centroid 0 = +x, centroid 1 = +y. Group A is a
    # transitive chain (a1~a2, a2~a3 above threshold; a1~a3 below) in
    # cell 0; b1 alone in cell 1; n1 in cell 0 but far from the chain.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.998, 0.054, 0.0]),       # cos(1,2) ~ 0.998
        (3, [0.992, 0.108, 0.0]),       # cos(2,3) ~ 0.9985, cos(1,3) ~ 0.992
        (10, [0.0, 1.0, 0.0]),
        (20, [0.7, 0.0, 0.7]),          # cell 0, cos vs chain ~ 0.7
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]

    pairs = semantic_pairs(
        e, n_centroids=2, threshold=0.995, centroids=cents
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2), (2, 3)}

    out = {
        r["vec_id"]: r.asDict()
        for r in semantic_dedup(
            e, n_centroids=2, threshold=0.995, centroids=cents
        ).collect()
    }
    # transitive closure: 1-2-3 one cluster rooted at 1 even though the
    # (1, 3) pair itself is below threshold
    assert [out[i]["cluster_id"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [out[i]["is_duplicate"] for i in (1, 2, 3)] == [False, True, True]
    assert out[1]["cluster_size"] == 3
    # singletons keep themselves
    assert out[10]["cluster_id"] == 10 and not out[10]["is_duplicate"]
    assert out[20]["cluster_id"] == 20 and out[20]["cluster_size"] == 1


def test_top_ngrams_counts_and_tiebreak(spark):
    from horus_spark.operators.textstats import top_ngrams

    df = spark.createDataFrame(
        [
            ("d1", "a b a b c"),   # "a b" x2, "b a" x1, "b c" x1
            ("d2", "a b z"),       # "a b" x1, "b z" x1
            ("d3", "solo"),        # too short for bigrams
        ],
        "doc_id string, text string",
    )
    rows = top_ngrams(df, n=2, k=3).collect()
    assert [(r["gram"], r["n_occurrences"], r["n_docs"]) for r in rows] == [
        ("a b", 3, 2),
        ("b a", 1, 1),  # ties at 1 broken by gram ascending
        ("b c", 1, 1),
    ]


def test_decontaminate_line_wrapping_still_collides(spark):
    # '\n' must normalize to a SPACE, not vanish: deleting it would fuse
    # the words around a line break and hide verbatim contamination.
    from horus_spark.operators.decontam import decontaminate

    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog")],
        "doc_id string, text string",
    )
    corpus = spark.createDataFrame(
        [("c1", "prefix the quick brown\nfox jumps over the lazy dog suffix"),
         ("c2", "tab\tseparated words only here nothing shared at all")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r["is_contaminated"]
           for r in decontaminate(corpus, bench, n=5).collect()}
    assert out == {"c1": True, "c2": False}
