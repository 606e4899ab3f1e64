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

# --- mojibake repair (q135 unit) -------------------------------------

from horus_spark.operators.textfix import fix_mojibake  # noqa: E402


def _moji(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    corrupted = df.select(
        "doc_id",
        F.decode(F.encode(F.col("text"), "UTF-8"), "ISO-8859-1").alias("text"),
    )
    return {r["doc_id"]: r for r in fix_mojibake(corrupted).collect()}


def test_mojibake_roundtrip_two_byte(spark):
    orig = "hällo wörld"
    r = _moji(spark, [orig])[0]
    assert r["text_fixed"] == orig
    assert r["was_mojibake"] is True
    assert r["n_fixed"] == 2  # two 2-byte codepoints, one char saved each


def test_mojibake_roundtrip_three_byte(spark):
    orig = "price €50 only"  # euro sign: 3-byte UTF-8
    r = _moji(spark, [orig])[0]
    assert r["text_fixed"] == orig
    assert r["was_mojibake"] is True
    assert r["n_fixed"] == 2  # 3 bytes collapse to 1 char


def test_ascii_untouched(spark):
    r = _moji(spark, ["plain ascii text"])[0]
    assert r["text_fixed"] == "plain ascii text"
    assert r["was_mojibake"] is False
    assert r["n_fixed"] == 0


def test_clean_accents_not_misrepaired(spark):
    # NOT corrupted: genuine umlauts followed by ASCII letters never
    # form a lead+continuation pair, so the repair must not fire.
    df = spark.createDataFrame(
        [(0, "hällo wörld")], "doc_id long, text string"
    )
    r = fix_mojibake(df).collect()[0]
    assert r["text_fixed"] == "hällo wörld"
    assert r["was_mojibake"] is False


def test_wide_codepoint_blocks_repair(spark):
    # A codepoint beyond U+00FF proves the buffer is NOT misread
    # Latin-1; even with a mojibake-looking pair present the
    # round-trip guard must skip the (lossy) repair.
    s = "Ã¤ looks broken but 世界 is genuine"
    df = spark.createDataFrame([(0, s)], "doc_id long, text string")
    r = fix_mojibake(df).collect()[0]
    assert r["text_fixed"] == s
    assert r["was_mojibake"] is False


def test_null_text_empty_result(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = fix_mojibake(df).collect()[0]
    assert r["text_fixed"] == ""
    assert r["was_mojibake"] is False
    assert r["n_fixed"] == 0


def test_mojibake_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
