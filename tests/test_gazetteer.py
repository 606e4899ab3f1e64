"""gazetteer_match: dictionary phrase tagging — positions, overlaps,
normalization, and the broadcast (corpus-shuffle-free) plan shape."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.gazetteer import gazetteer_counts, gazetteer_match


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [
            ("table scan", "PLAN"),
            ("hash join", "PLAN"),
            ("sort merge join", "PLAN"),
            ("spark", "ENGINE"),
            ("  Table   SCAN ", "PLAN"),  # dup after normalization
        ],
        "phrase string, label string",
    )


def test_positions_and_overlaps(spark, dim):
    docs = spark.createDataFrame(
        [
            ("d1", "the table scan feeds a hash join"),
            ("d2", "sort merge join beats hash join here"),
            ("d3", "no match at all"),
            ("d4", None),
        ],
        "doc_id string, text string",
    )
    got = {
        (r.doc_id, r.phrase, r.start, r.end_)
        for r in gazetteer_match(docs, dim).collect()
    }
    assert got == {
        ("d1", "table scan", 2, 3),
        ("d1", "hash join", 6, 7),
        # overlap: "sort merge join" (1-3) AND its inner "hash join"-free
        # sibling do not suppress each other; "hash join" at 5-6 too
        ("d2", "sort merge join", 1, 3),
        ("d2", "hash join", 5, 6),
    }


def test_case_and_whitespace_normalization(spark, dim):
    docs = spark.createDataFrame(
        [("d1", "TABLE Scan and SPARK")], "doc_id string, text string"
    )
    got = gazetteer_match(docs, dim).collect()
    # the duplicate "  Table   SCAN " dictionary row collapsed: exactly
    # one match for the normalized bigram, not two
    assert sorted((r.phrase, r.start) for r in got) == [
        ("spark", 4),
        ("table scan", 1),
    ]
    # case-sensitive mode: no matches for the lowercase dictionary forms
    cs = gazetteer_match(docs, dim, lowercase=False).collect()
    assert cs == []


def test_counts_rollup(spark, dim):
    docs = spark.createDataFrame(
        [
            ("d1", "spark spark spark"),
            ("d2", "spark and a table scan"),
        ],
        "doc_id string, text string",
    )
    m = gazetteer_match(docs, dim)
    got = {
        r.phrase: (r.n_matches, r.n_docs)
        for r in gazetteer_counts(m).collect()
    }
    assert got == {"spark": (4, 2), "table scan": (1, 1)}


def test_empty_dictionary_raises(spark):
    docs = spark.createDataFrame([("d1", "x")], "doc_id string, text string")
    empty = spark.createDataFrame(
        [("", "L"), ("   ", "L")], "phrase string, label string"
    )
    with pytest.raises(ValueError):
        gazetteer_match(docs, empty)


def test_plan_is_broadcast_no_corpus_shuffle(spark, dim):
    """The dictionary must broadcast: BroadcastHashJoin in the plan, no
    SortMergeJoin, and no Exchange on the corpus side below the join
    (the only allowed exchange is the broadcast one)."""
    docs = spark.createDataFrame(
        [("d1", "table scan")], "doc_id string, text string"
    )
    plan = gazetteer_match(docs, dim)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the streamed (corpus) leg prints between the join node and the
    # BroadcastExchange subtree: it must contain no shuffle; the only
    # hash Exchange allowed anywhere is the dictionary's own dedup,
    # which sits BELOW the BroadcastExchange on the small side
    corpus_leg = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_leg
