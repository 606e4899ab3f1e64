"""MaxScore dynamic-pruned BM25 (operators/ranking.py:maxscore_topk /
maxscore_candidates): exact-equality with the exhaustive scorer plus
proof the prune actually prunes."""

from pyspark.sql import functions as F

from horus_spark.operators.ranking import (
    _term_scores,
    bm25_topk,
    maxscore_candidates,
    maxscore_topk,
    normalize_query,
)

# skewed fixture: 'common' in every doc, 'rare' in 3 high-scoring docs.
# The rare seed's k-th best threshold should kill most common-only docs.
DOCS = [
    (f"d{i:02d}", "common filler words here " + ("rare gem " if i < 3 else "") + "tail " * (i % 5))
    for i in range(40)
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_equals_exhaustive(spark):
    d = _df(spark)
    got = maxscore_topk(d, "rare common", k=5).collect()
    want = bm25_topk(d, "rare common", k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_prune_is_effective(spark):
    d = _df(spark)
    ts = _term_scores(
        d, normalize_query("rare common"), "doc_id", "text", 1.2, 0.75
    ).localCheckpoint(eager=False)
    n_matched = ts.select("id").distinct().count()
    n_cands = maxscore_candidates(ts, 3, 1.2).count()
    assert n_matched == 40  # every doc matches 'common'
    # docs holding only 'common' bound below the rare-seeded threshold
    assert n_cands < n_matched
    assert n_cands >= 3  # the true top-3 always survive


def test_seed_shorter_than_k_degrades_to_exhaustive(spark):
    d = _df(spark)
    # k=10 > 3 rare-seed docs -> theta = -inf -> all matched survive
    got = maxscore_topk(d, "rare common", k=10).collect()
    want = bm25_topk(d, "rare common", k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    ts = _term_scores(
        d, normalize_query("rare common"), "doc_id", "text", 1.2, 0.75
    ).localCheckpoint(eager=False)
    assert maxscore_candidates(ts, 10, 1.2).count() == 40


def test_single_term_query(spark):
    d = _df(spark)
    got = maxscore_topk(d, "common", k=4).collect()
    want = bm25_topk(d, "common", k=4).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_no_match_empty(spark):
    d = _df(spark)
    assert maxscore_topk(d, "zzz qqq", k=5).count() == 0


def test_best_snippet(spark):
    from horus_spark.operators.ranking import best_snippet

    df = spark.createDataFrame(
        [
            ("d1", "alpha Spark! beta gamma spark merge delta spark filter zeta"),
            ("d2", "nothing relevant here"),
            ("d3", "dup at end only dup"),
        ],
        "doc_id string, text string",
    )
    rows = {
        r["id"]: (r["n_matches"], r["snippet_start"], r["snippet"])
        for r in best_snippet(df, "spark merge filter dup", width=5).collect()
    }
    # best window [4..8] beats the earlier 3-match window at 'Spark!'
    assert rows["d1"] == (4, 4, "spark merge delta spark filter")
    # snippet quotes ORIGINAL text while matching normalized terms
    assert rows["d3"] == (2, 0, "dup at end only dup")
    assert "d2" not in rows  # no match -> no row


def test_best_snippet_tie_breaks_earliest_and_guards(spark):
    import pytest

    from horus_spark.operators.ranking import best_snippet

    df = spark.createDataFrame(
        [("d", "dup x x x dup y y y")], "doc_id string, text string"
    )
    r = best_snippet(df, "dup", width=2).collect()[0]
    assert (r["n_matches"], r["snippet_start"]) == (1, 0)  # earliest tie
    with pytest.raises(ValueError):
        best_snippet(df, "dup", width=0)
    plan = best_snippet(df, "dup")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
