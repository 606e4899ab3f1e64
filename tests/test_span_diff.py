"""span_diff: every verdict class on hand fixtures, offset-value
insensitivity (order is the invariant), empty arrays, field precedence,
and the digest screen's payload pruning."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.interleave import span_diff

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _doc(doc_id, triples, offsets=None):
    offs = offsets or list(range(len(triples)))
    return (
        doc_id,
        [(k, t, m, o) for (k, t, m), o in zip(triples, offs)],
    )


@pytest.fixture(scope="module")
def pair(spark):
    base = [
        ("text", "hello world", ""),
        ("image", "", "asset-1"),
        ("text", "tail chunk", ""),
    ]
    expected = [
        _doc("eq", base),
        # same triples, different offset VALUES (order preserved)
        _doc("eq-offsets", base),
        _doc("div-text", base),
        _doc("div-kind", base),
        _doc("div-ref", base),
        _doc("shorter-actual", base),
        _doc("longer-actual", base),
        _doc("only-expected", base),
        _doc("empty-both", []),
        _doc("empty-actual", [("text", "x", "")]),
    ]
    mut = dict(base=base)
    actual = [
        _doc("eq", base),
        _doc("eq-offsets", base, offsets=[10, 20, 30]),
        _doc("div-text", [base[0], ("image", "", "asset-1"),
                          ("text", "tail CHANGED", "")]),
        _doc("div-kind", [base[0], ("video", "", "asset-1"), base[2]]),
        _doc("div-ref", [base[0], ("image", "", "asset-9"), base[2]]),
        _doc("shorter-actual", base[:2]),
        _doc("longer-actual", base + [("text", "extra", "")]),
        _doc("only-actual", base),
        _doc("empty-both", []),
        _doc("empty-actual", []),
    ]
    del mut
    return (
        spark.createDataFrame(actual, SCHEMA),
        spark.createDataFrame(expected, SCHEMA),
    )


def test_all_verdicts(spark, pair):
    actual, expected = pair
    got = {
        r.doc_id: (
            r.verdict,
            r.n_actual,
            r.n_expected,
            r.first_divergence,
            r.field,
        )
        for r in span_diff(actual, expected).collect()
    }
    assert got["eq"] == ("equal", 3, 3, -1, None)
    # offsets 10/20/30 vs 0/1/2: order identical -> equal
    assert got["eq-offsets"] == ("equal", 3, 3, -1, None)
    assert got["div-text"] == ("diverged", 3, 3, 2, "text")
    assert got["div-kind"] == ("diverged", 3, 3, 1, "kind")
    assert got["div-ref"] == ("diverged", 3, 3, 1, "media_ref")
    assert got["shorter-actual"] == ("length_mismatch", 2, 3, 2, None)
    assert got["longer-actual"] == ("length_mismatch", 4, 3, 3, None)
    assert got["only-expected"] == ("missing_actual", None, 3, None, None)
    assert got["only-actual"] == ("missing_expected", 3, None, None, None)
    assert got["empty-both"] == ("equal", 0, 0, -1, None)
    assert got["empty-actual"] == ("length_mismatch", 0, 1, 0, None)
    assert len(got) == 11


def test_kind_precedence_over_text(spark):
    # both kind and text differ at the same position -> field = kind
    e = [("d", [("text", "a", "", 0)])]
    a = [("d", [("image", "b", "", 0)])]
    r = span_diff(
        spark.createDataFrame(a, SCHEMA), spark.createDataFrame(e, SCHEMA)
    ).collect()[0]
    assert (r.verdict, r.first_divergence, r.field) == ("diverged", 0, "kind")


def test_unsorted_input_arrays(spark):
    # spans arrive in arbitrary array order; offsets define the sequence
    e = [("d", [("text", "first", "", 0), ("text", "second", "", 1)])]
    a = [("d", [("text", "second", "", 7), ("text", "first", "", 3)])]
    r = span_diff(
        spark.createDataFrame(a, SCHEMA), spark.createDataFrame(e, SCHEMA)
    ).collect()[0]
    assert r.verdict == "equal"
