"""HTML table extraction (operators/html.py:extract_tables /
table_shapes): markup-grid recovery, tolerances, summary stats."""

from pyspark.sql import functions as F

from horus_spark.operators.html import extract_tables, table_shapes

# thead/tbody wrappers, attributes, case-insensitive tags, th/td mix,
# a ragged second data row, inline markup + an empty cell.
PAGE = (
    "<html><body><p>no table here</p>"
    '<TABLE border="1" class="data">'
    "<thead><tr><th>Name</th><TH scope=\"col\">Qty</TH></tr></thead>"
    "<tbody>"
    "<tr><td>alpha <b>one</b></td><td align=right> 7 </td></tr>"
    "<tr class=x><TD>beta</TD></tr>"
    "<tr><td></td><td>9</td></tr>"
    "</tbody></TABLE>"
    "<table><tr><td>second</td></tr></table>"
    "</body></html>"
)


def _cells(spark, html):
    df = spark.createDataFrame([("d1", html)], "doc_id string, html string")
    return extract_tables(df)


def test_cell_grid(spark):
    rows = {
        (r["table_pos"], r["row_pos"], r["col_pos"]): (
            r["is_header"],
            r["cell_text"],
        )
        for r in _cells(spark, PAGE).collect()
    }
    assert rows == {
        (0, 0, 0): (True, "Name"),
        (0, 0, 1): (True, "Qty"),
        (0, 1, 0): (False, "alpha one"),
        (0, 1, 1): (False, "7"),
        (0, 2, 0): (False, "beta"),
        (0, 3, 0): (False, ""),
        (0, 3, 1): (False, "9"),
        (1, 0, 0): (False, "second"),
    }


def test_no_table_no_rows(spark):
    assert _cells(spark, "<html><body><p>plain</p></body></html>").count() == 0


def test_doc_id_passthrough_and_types(spark):
    out = _cells(spark, PAGE)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "table_pos", "row_pos", "col_pos", "is_header",
        "cell_text",
    ]
    assert out.schema["table_pos"].dataType.simpleString() == "int"
    assert {r["doc_id"] for r in out.collect()} == {"d1"}


def test_nested_table_truncates_outer(spark):
    # non-greedy scan: the inner </table> ends the first match; the
    # trailing outer cell then matches as a second table fragment's row
    html = (
        "<table><tr><td>out1</td></tr>"
        "<table><tr><td>in</td></tr></table>"
        "<tr><td>out2</td></tr></table>"
    )
    got = [
        (r["table_pos"], r["row_pos"], r["cell_text"])
        for r in _cells(spark, html)
        .orderBy("table_pos", "row_pos", "col_pos")
        .collect()
    ]
    assert got == [(0, 0, "out1"), (0, 1, "in")]


def test_shapes(spark):
    shapes = {
        r["table_pos"]: r.asDict()
        for r in table_shapes(_cells(spark, PAGE)).collect()
    }
    t0 = shapes[0]
    assert (t0["n_rows"], t0["n_cols"], t0["min_cols"]) == (4, 2, 1)
    assert t0["ragged"] is True
    assert t0["n_header_cells"] == 2
    assert t0["n_empty_cells"] == 1
    t1 = shapes[1]
    assert (t1["n_rows"], t1["n_cols"], t1["ragged"]) == (1, 1, False)


def test_extract_plan_shuffle_free(spark):
    df = spark.createDataFrame([("d1", PAGE)], "doc_id string, html string")
    plan = extract_tables(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tables_to_records(spark):
    from horus_spark.operators.html import tables_to_records

    recs = sorted(
        tuple(r)[1:]
        for r in tables_to_records(_cells(spark, PAGE)).collect()
    )
    # table 0: header (Name, Qty); ragged row 2 has no Qty cell;
    # table 1 has no header -> contributes nothing
    assert recs == sorted(
        [
            (0, 1, "Name", "alpha one"),
            (0, 1, "Qty", "7"),
            (0, 2, "Name", "beta"),
            (0, 3, "Name", ""),
            (0, 3, "Qty", "9"),
        ]
    )


def test_tables_to_records_wider_data_row_dropped(spark):
    from horus_spark.operators.html import tables_to_records

    html = (
        "<table><tr><th>A</th></tr>"
        "<tr><td>x</td><td>overflow</td></tr></table>"
    )
    recs = [tuple(r)[1:] for r in tables_to_records(_cells(spark, html)).collect()]
    assert recs == [(0, 1, "A", "x")]  # the overflow cell has no name
