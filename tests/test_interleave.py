"""Interleaved-span operators: structure stats + caption-pair mining.

Hand-computed fixtures pin the adjacency rule (preceding text preferred,
else following, else no pair), the selection-before-bounds semantic, the
offset-sort independence, and the empty/degenerate shapes; a plan check
asserts both operators stay shuffle-free.
"""

import pytest
from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def T(text, off):
    return ("text", text, "", off)


def M(kind, ref, off):
    return (kind, "", ref, off)


@pytest.fixture(scope="module")
def corpus(spark):
    return _mk(
        spark,
        [
            # T M M T : transitions T->M, M->T; runs of text = 1,1
            ("a", [T("hello world foo", 0), M("image", "a1", 1),
                   M("video", "a2", 2), T("tail caption here", 3)]),
            # lone media: no caption possible
            ("b", [M("image", "b1", 0)]),
            # media-first: caption comes from the following span
            ("c", [M("image", "c1", 0), T("after text", 1)]),
            # short preceding caption: selected then bounds-dropped
            # (must NOT fall through to the long following span)
            ("d", [T("tiny", 0), M("image", "d1", 1),
                   T("long enough caption span", 2)]),
            # empty spans array
            ("e", []),
            # all text, no media
            ("f", [T("just words", 0), T("more words", 1)]),
        ],
    )


def test_interleave_stats_values(corpus):
    from horus_spark.operators.interleave import interleave_stats

    got = {
        r["doc_id"]: r.asDict()
        for r in interleave_stats(corpus).collect()
    }
    assert got["a"] == {
        "doc_id": "a", "n_spans": 4, "n_text": 2, "n_media": 2,
        "n_transitions": 2, "max_text_run": 1,
        "text_chars": len("hello world foo") + len("tail caption here"),
    }
    assert got["b"]["n_transitions"] == 0
    assert got["b"]["max_text_run"] == 0
    assert got["e"] == {
        "doc_id": "e", "n_spans": 0, "n_text": 0, "n_media": 0,
        "n_transitions": 0, "max_text_run": 0, "text_chars": 0,
    }
    assert got["f"]["n_transitions"] == 0
    assert got["f"]["max_text_run"] == 2
    assert got["d"]["n_transitions"] == 2


def test_interleave_stats_offset_order_not_input_order(spark):
    """Stats follow offset order, not the array's physical order."""
    from horus_spark.operators.interleave import interleave_stats

    shuffled = _mk(
        spark,
        [("x", [T("b", 2), M("image", "x1", 1), T("a", 0), T("c", 3)])],
    )
    row = interleave_stats(shuffled).collect()[0]
    # offset order: T M T T -> 2 transitions, max text run 2
    assert row["n_transitions"] == 2
    assert row["max_text_run"] == 2


def test_caption_pairs_adjacency_rule(corpus):
    from horus_spark.operators.interleave import caption_pairs

    got = {
        r["media_ref"]: r.asDict()
        for r in caption_pairs(corpus, min_tokens=1, max_tokens=64).collect()
    }
    # a1: preceding text; a2: preceding is media -> following text
    assert got["a1"]["caption"] == "hello world foo"
    assert got["a1"]["cap_src"] == "before"
    assert got["a1"]["n_cap_tokens"] == 3
    assert got["a2"]["caption"] == "tail caption here"
    assert got["a2"]["cap_src"] == "after"
    # b1: no text neighbour at all -> no pair
    assert "b1" not in got
    # c1: media-first doc -> following
    assert got["c1"]["cap_src"] == "after"
    # d1: preceding 'tiny' selected (1 token, passes min_tokens=1)
    assert got["d1"]["caption"] == "tiny"


def test_caption_selection_before_bounds(corpus):
    """A too-short preceding caption drops the pair; it does NOT fall
    through to the following text span."""
    from horus_spark.operators.interleave import caption_pairs

    got = {
        r["media_ref"]
        for r in caption_pairs(corpus, min_tokens=2, max_tokens=64).collect()
    }
    assert "d1" not in got  # 'tiny' selected, then bounds-dropped
    assert "a1" in got and "a2" in got and "c1" in got


def test_caption_pairs_param_guards(corpus):
    from horus_spark.operators.interleave import caption_pairs

    with pytest.raises(ValueError):
        caption_pairs(corpus, min_tokens=0)
    with pytest.raises(ValueError):
        caption_pairs(corpus, min_tokens=5, max_tokens=4)


def test_interleave_plans_shuffle_free(corpus):
    from horus_spark.operators.interleave import caption_pairs, interleave_stats

    for df in (interleave_stats(corpus), caption_pairs(corpus)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
