"""Positional inverted index + phrase search (operators/invindex.py, q128)."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.invindex import build_postings, phrase_matches

DOCS = [
    (0, "the quick brown fox jumps over the quick brown dog"),
    (1, "quick brown quick brown quick brown"),
    (2, "the slow brown fox"),
    (3, "quick"),
]


@pytest.fixture(scope="module")
def postings(spark):
    return build_postings(
        spark.createDataFrame(DOCS, ["doc_id", "text"])
    ).localCheckpoint()


def test_postings_positions_exact(postings):
    rows = {
        (r["term"], r["id"]): (list(r["positions"]), r["tf"])
        for r in postings.collect()
    }
    assert rows[("quick", 0)] == ([1, 7], 2)
    assert rows[("the", 0)] == ([0, 6], 2)
    assert rows[("brown", 1)] == ([1, 3, 5], 3)
    assert rows[("quick", 3)] == ([0], 1)


def test_phrase_two_terms(postings):
    got = {
        r["id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_matches(postings, ["quick", "brown"]).collect()
    }
    assert got == {0: (2, 1), 1: (3, 0)}


def test_phrase_three_terms(postings):
    got = {
        r["id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_matches(postings, ["the", "quick", "brown"]).collect()
    }
    assert got == {0: (2, 0)}


def test_phrase_overlapping_repeated_term(postings):
    # "quick brown quick": doc 1 has it at 0 and 2 (overlapping use of
    # position 2's "quick" as both end and start is legal)
    got = {
        r["id"]: r["n_matches"]
        for r in phrase_matches(
            postings, ["quick", "brown", "quick"]
        ).collect()
    }
    assert got == {1: 2}


def test_single_term_phrase(postings):
    got = {
        r["id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_matches(postings, ["quick"]).collect()
    }
    assert got == {0: (2, 1), 1: (3, 0), 3: (1, 0)}


def test_absent_phrase_no_rows(postings):
    assert phrase_matches(postings, ["brown", "the"]).collect() == []


def test_empty_phrase_rejected(postings):
    with pytest.raises(ValueError):
        phrase_matches(postings, [])
