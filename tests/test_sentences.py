"""Sentence segmentation (operators/sentences.py)."""

from pyspark.sql import functions as F

from horus_spark.operators.sentences import sentence_stats, split_sentences

TEXT = (
    "First sentence ends here. Second one, i.e. with an abbreviation, "
    "survives. Pi is 3.14 and stays whole! Really?! Yes. trailing "
    "lowercase never splits. Final tail without terminator"
)


def _sents(spark, text):
    df = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    return [r["sentence"] for r in split_sentences(df).orderBy("sent_pos").collect()]


def test_boundaries_and_traps(spark):
    got = _sents(spark, TEXT)
    assert got == [
        "First sentence ends here.",
        "Second one, i.e. with an abbreviation, survives.",
        "Pi is 3.14 and stays whole!",
        "Really?!",
        "Yes. trailing lowercase never splits.",
        "Final tail without terminator",
    ]


def test_multi_terminator_run_is_one_boundary(spark):
    assert _sents(spark, "Wait... What now? Done.") == [
        "Wait...",
        "What now?",
        "Done.",
    ]


def test_digit_opens_sentence(spark):
    assert _sents(spark, "Version one shipped. 2 bugs remained.") == [
        "Version one shipped.",
        "2 bugs remained.",
    ]


def test_empty_and_null(spark):
    df = spark.createDataFrame(
        [("a", ""), ("b", None), ("c", "  Only one.  ")],
        "doc_id string, text string",
    )
    rows = split_sentences(df).collect()
    assert [(r["id"], r["sentence"]) for r in rows] == [("c", "Only one.")]


def test_stats(spark):
    df = spark.createDataFrame(
        [("d1", "One two. Three four five. Six."), ("d2", "")],
        "doc_id string, text string",
    )
    rows = {r["id"]: r.asDict() for r in sentence_stats(df).collect()}
    d1 = rows["d1"]
    assert d1["n_sentences"] == 3
    # chars: 8 + 16 + 4 = 28 -> 28e6 div 3
    assert d1["mean_sent_chars_ppm"] == 28_000_000 // 3
    assert d1["max_sent_chars"] == 16
    # words: 2 + 3 + 1 = 6 -> exactly 2e6
    assert d1["mean_sent_words_ppm"] == 2_000_000
    d2 = rows["d2"]
    assert d2["n_sentences"] == 0
    assert d2["mean_sent_chars_ppm"] is None
    assert d2["max_sent_chars"] == 0


def test_plans_shuffle_free(spark):
    df = spark.createDataFrame([("d1", TEXT)], "doc_id string, text string")
    for frame in (split_sentences(df), sentence_stats(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_readability_hand_values(spark):
    from horus_spark.operators.sentences import readability

    # "Go now. Stop here." : 4 words, 2 sentences, syllables:
    # go=1, now=1, stop=1, here=2 -> 5
    df = spark.createDataFrame(
        [("d1", "Go now. Stop here."), ("d2", ""), ("d3", None)],
        "doc_id string, text string",
    )
    rows = {r["id"]: r.asDict() for r in readability(df).collect()}
    d1 = rows["d1"]
    assert (d1["n_words"], d1["n_sentences"], d1["n_syllables"]) == (4, 2, 5)
    wps = 4 * 1_000_000 // 2
    spw = 5 * 1_000_000 // 4
    assert d1["flesch_milli"] == (
        206_835 - (1015 * wps) // 1_000_000 - (84_600 * spw) // 1_000_000
    )
    for k in ("d2", "d3"):
        assert rows[k]["n_words"] == 0
        assert rows[k]["flesch_milli"] is None


def test_readability_syllable_floor_and_case(spark):
    from horus_spark.operators.sentences import readability

    # "Mth" has no vowels -> floored to 1; "AEIOU" is one vowel group
    # after lowercasing; "3.14" floors to 1
    df = spark.createDataFrame(
        [("d", "Mth AEIOU 3.14")], "doc_id string, text string"
    )
    r = readability(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)


def test_readability_plan_shuffle_free(spark):
    from horus_spark.operators.sentences import readability

    df = spark.createDataFrame([("d", TEXT)], "doc_id string, text string")
    plan = readability(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sentence_windows_next_fit(spark):
    from horus_spark.operators.sentences import sentence_windows

    # sentences of 2/3/4/8 tokens; budget 6:
    # [2+3=5] | [4] | [8 oversized alone]
    text = "One two. Three four five. Six seven eight nine. T0 " + " ".join(
        f"t{i}" for i in range(1, 8)
    ) + "."
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    rows = [
        tuple(r)[1:]
        for r in sentence_windows(df, budget=6).orderBy("window_id").collect()
    ]
    assert rows == [
        (0, 2, 5, "One two. Three four five."),
        (1, 1, 4, "Six seven eight nine."),
        (2, 1, 8, "T0 t1 t2 t3 t4 t5 t6 t7."),
    ]


def test_sentence_windows_empty_and_guard(spark):
    import pytest

    from horus_spark.operators.sentences import sentence_windows

    df = spark.createDataFrame(
        [("a", ""), ("b", None)], "doc_id string, text string"
    )
    assert sentence_windows(df).count() == 0
    with pytest.raises(ValueError):
        sentence_windows(df, budget=0)


def test_sentence_windows_plan_shuffle_free(spark):
    from horus_spark.operators.sentences import sentence_windows

    df = spark.createDataFrame([("d", TEXT)], "doc_id string, text string")
    plan = (
        sentence_windows(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
