"""De-hyphenation repair (operators/textfix.py, q124 unit)."""

from pyspark.sql import functions as F

from horus_spark.operators.textfix import dehyphenate


def _run(spark, lines):
    df = spark.createDataFrame([(0, lines)], "doc_id long, lines array<string>")
    r = dehyphenate(df).collect()[0]
    return r["text_repaired"], r["n_joins"]


def test_basic_join(spark):
    text, n = _run(spark, ["this is an exam-", "ple of repair"])
    assert text == "this is an example of repair"
    assert n == 1


def test_uppercase_next_line_keeps_hyphen(spark):
    # "Well-\nBeing GmbH": next line starts uppercase — likely a true
    # compound or name; the conservative rule must NOT join.
    text, n = _run(spark, ["contact Well-", "Being GmbH today"])
    assert text == "contact Well- Being GmbH today"
    assert n == 0


def test_digit_before_hyphen_not_joined(spark):
    # "ISO 9001-\n2015": hyphen preceded by a digit is a range/number,
    # not typographic hyphenation.
    text, n = _run(spark, ["certified ISO 9001-", "2015 compliant"])
    assert text == "certified ISO 9001- 2015 compliant"
    assert n == 0


def test_multiple_joins_chain(spark):
    text, n = _run(
        spark,
        ["the infor-", "mation retri-", "eval system"],
    )
    assert text == "the information retrieval system"
    assert n == 2


def test_empty_and_null_lines_dropped(spark):
    df = spark.createDataFrame(
        [(1, ["alpha beta-", None, "  ", "gamma delta"])],
        "doc_id long, lines array<string>",
    )
    r = dehyphenate(df).collect()[0]
    # the blank/None lines vanish; beta- still joins with gamma's line
    assert r["text_repaired"] == "alpha betagamma delta"
    assert r["n_joins"] == 1


def test_no_lines_empty_text(spark):
    text, n = _run(spark, [])
    assert text == ""
    assert n == 0


def test_whitespace_padding_trimmed(spark):
    text, n = _run(spark, ["  lead-  ", "  ing  "])
    # trailing spaces are trimmed before the $-anchored check
    assert text == "leading"
    assert n == 1


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(0, ["a-", "b"])], "doc_id long, lines array<string>"
    )
    plan = dehyphenate(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
