"""Multi-column reading order (operators/reading_order.py, q125 unit)."""

from pyspark.sql import functions as F

from horus_spark.operators.reading_order import column_reading_order

SCHEMA = "doc_id long, page int, frag_id int, x0 double, y0 double, x1 double, y1 double"


def _order(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = column_reading_order(df, **kw).orderBy("read_ord").collect()
    return [(r["frag_id"], r["col_idx"], r["n_columns"]) for r in out]


def test_two_columns_column_major(spark):
    rows = [
        # left column: frags 0,1 at x [1,3]; right column: frags 2,3 at [4.5,6.5]
        (1, 0, 0, 1.0, 1.0, 3.0, 1.2),
        (1, 0, 1, 1.0, 1.4, 3.0, 1.6),
        (1, 0, 2, 4.5, 1.0, 6.5, 1.2),
        (1, 0, 3, 4.5, 1.4, 6.5, 1.6),
    ]
    assert _order(spark, rows) == [
        (0, 0, 2), (1, 0, 2), (2, 1, 2), (3, 1, 2),
    ]


def test_full_width_fragment_blocks_split(spark):
    # a title spanning both columns bridges the gutter — no split
    rows = [
        (1, 0, 0, 1.0, 0.5, 6.5, 0.7),  # full-width title
        (1, 0, 1, 1.0, 1.0, 3.0, 1.2),
        (1, 0, 2, 4.5, 1.0, 6.5, 1.2),
    ]
    got = _order(spark, rows)
    assert all(n == 1 for _, _, n in got)
    # row-major: title, then left, then right (same y, x breaks tie)
    assert [f for f, _, _ in got] == [0, 1, 2]


def test_margin_note_does_not_split(spark):
    # 1 fragment far right vs 9 in the body: fails min_side_frac=0.2
    rows = [(1, 0, i, 1.0, 1.0 + i * 0.3, 3.0, 1.2 + i * 0.3) for i in range(9)]
    rows.append((1, 0, 9, 6.0, 1.0, 7.0, 1.2))
    got = _order(spark, rows)
    assert all(n == 1 for _, _, n in got)


def test_narrow_gap_not_a_gutter(spark):
    # 0.3in gap < min_gap=0.5 — ordinary word spacing, not a gutter
    rows = [
        (1, 0, 0, 1.0, 1.0, 3.0, 1.2),
        (1, 0, 1, 3.3, 1.0, 5.0, 1.2),
        (1, 0, 2, 1.0, 1.4, 3.0, 1.6),
        (1, 0, 3, 3.3, 1.4, 5.0, 1.6),
    ]
    got = _order(spark, rows)
    assert all(n == 1 for _, _, n in got)


def test_widest_gutter_wins(spark):
    # two qualifying valleys: [2.0, 2.6] (0.6in) and [4.6, 6.0] (1.4in);
    # the widest (rightmost here) must be chosen
    rows = [
        (1, 0, 0, 1.0, 1.0, 2.0, 1.2),
        (1, 0, 1, 2.6, 1.0, 4.6, 1.2),
        (1, 0, 2, 6.0, 1.0, 7.0, 1.2),
        (1, 0, 3, 1.0, 1.4, 2.0, 1.6),
        (1, 0, 4, 2.6, 1.4, 4.6, 1.6),
        (1, 0, 5, 6.0, 1.4, 7.0, 1.6),
    ]
    got = {f: c for f, c, _ in _order(spark, rows)}
    assert got == {0: 0, 1: 0, 3: 0, 4: 0, 2: 1, 5: 1}


def test_per_page_independence(spark):
    # page 0 two-column, page 1 single-column, same doc
    rows = [
        (1, 0, 0, 1.0, 1.0, 3.0, 1.2),
        (1, 0, 1, 4.5, 1.0, 6.5, 1.2),
        (1, 1, 0, 1.0, 1.0, 7.0, 1.2),
        (1, 1, 1, 1.0, 1.4, 7.0, 1.6),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = column_reading_order(df).collect()
    ncols = {(r["page"], r["frag_id"]): r["n_columns"] for r in out}
    assert ncols[(0, 0)] == 2 and ncols[(1, 0)] == 1


def test_shared_x0_fragments_single_gutter(spark):
    # two right-column frags with IDENTICAL x0 detect the same gutter;
    # the balance count must not double (regression: gaps dedup)
    rows = [
        (1, 0, 0, 1.0, 1.0, 3.0, 1.2),
        (1, 0, 1, 1.0, 1.4, 3.0, 1.6),
        (1, 0, 2, 4.5, 1.0, 6.5, 1.2),
        (1, 0, 3, 4.5, 1.4, 6.5, 1.6),
        (1, 0, 4, 4.5, 1.8, 6.5, 2.0),
    ]
    got = _order(spark, rows)
    assert [c for _, c, _ in got] == [0, 0, 1, 1, 1]
    assert all(n == 2 for _, _, n in got)
