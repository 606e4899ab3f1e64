"""Heading-outline extraction (operators/html.py:page_outline)."""

from horus_spark.operators.html import page_outline

PAGE = (
    "<html><body><h1>Top</h1><p>decoy para</p>"
    '<H2 class="a">Sec <b>One</b></H2><h3>Deep</h3>'
    "<h2>Sec Two</h2><h4>Skips a level</h4>"
    "<h1>Second Top</h1><h2>Under second</h2></body></html>"
)


def _rows(spark, html):
    df = spark.createDataFrame([("d", html)], "doc_id string, html string")
    return [tuple(r)[1:] for r in page_outline(df).orderBy("heading_pos").collect()]


def test_outline_tree(spark):
    assert _rows(spark, PAGE) == [
        (0, 1, "Top", None),
        (1, 2, "Sec One", 0),  # case-insensitive tag, attrs, markup strip
        (2, 3, "Deep", 1),
        (3, 2, "Sec Two", 0),
        (4, 4, "Skips a level", 3),  # h4 under h2: nearest smaller wins
        (5, 1, "Second Top", None),  # new top: no preceding smaller level
        (6, 2, "Under second", 5),  # parents never cross back before h1
    ]


def test_mismatched_close_absorbed(spark):
    # the backreference pins the level digit: a mismatched </h3> never
    # CLOSES an <h2>, so the scan runs on to the next true </h2> and
    # the stray close strips out as markup (tolerant-absorption class,
    # same as the nested-table truncation) — one h2, never an h3 row
    assert _rows(spark, "<h2>broken</h3><h2>ok</h2>") == [
        (0, 2, "broken ok", None)
    ]
    # and a level digit that never closes yields nothing at all
    assert _rows(spark, "<h5>never closed</h6>") == []


def test_no_headings_no_rows(spark):
    df = spark.createDataFrame(
        [("d", "<p>nothing</p>")], "doc_id string, html string"
    )
    assert page_outline(df).count() == 0


def test_plan_shuffle_free(spark):
    df = spark.createDataFrame([("d", PAGE)], "doc_id string, html string")
    plan = page_outline(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_section_chunks(spark):
    from horus_spark.operators.html import section_chunks

    html = (
        "<html><head><script>var x=1;</script></head><body>"
        "<h1>Title</h1><p>intro text</p>"
        '<H2 class="a">First <b>Part</b></H2><p>alpha</p><h3>Depth</h3>'
        "<h2>Second Part</h2><ul><li>beta</li><li>gamma</li></ul>"
        "<h2>Empty Part</h2>"
        "</body></html>"
    )
    df = spark.createDataFrame([("d", html)], "doc_id string, html string")
    rows = [
        tuple(r)[1:]
        for r in section_chunks(df).orderBy("section_pos").collect()
    ]
    assert rows == [
        (0, None, "Title intro text"),
        (1, "First Part", "alpha Depth"),  # h3 flattens into parent
        (2, "Second Part", "beta gamma"),
        (3, "Empty Part", ""),  # heading with no body survives
    ]


def test_section_chunks_no_preamble_row_when_empty(spark):
    from horus_spark.operators.html import section_chunks

    df = spark.createDataFrame(
        [("d", "<h2>Only</h2><p>body</p>")], "doc_id string, html string"
    )
    rows = [tuple(r)[1:] for r in section_chunks(df).collect()]
    assert rows == [(1, "Only", "body")]


def test_section_chunks_level_param_and_guard(spark):
    import pytest

    from horus_spark.operators.html import section_chunks

    df = spark.createDataFrame(
        [("d", "<h3>A</h3><p>x</p><h3>B</h3>y")], "doc_id string, html string"
    )
    rows = [tuple(r)[1:] for r in section_chunks(df, level=3).collect()]
    assert rows == [(1, "A", "x"), (2, "B", "y")]
    with pytest.raises(ValueError):
        section_chunks(df, level=0)


def test_section_chunks_plan_shuffle_free(spark):
    from horus_spark.operators.html import section_chunks

    df = spark.createDataFrame(
        [("d", "<h2>A</h2>x")], "doc_id string, html string"
    )
    plan = section_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
