"""Integer least-squares deskew (operators/deskew.py, q130 unit)."""

from pyspark.sql import functions as F

from horus_spark.operators.deskew import estimate_skew


def _grid(doc, slope_ppm, n_lines=5, n_cols=6, pitch=0.3):
    """Word centers on a sheared grid: y = 1 + pitch*l + slope*x."""
    rows = []
    for l in range(n_lines):
        for c in range(n_cols):
            x = 1.0 + c * 1.0
            xm = int(round(x * 1e6))
            sm = abs(slope_ppm) * xm // 1_000_000
            ym = 1_000_000 + l * int(pitch * 1e6) + (-sm if slope_ppm < 0 else sm)
            rows.append((doc, 0, xm / 1e6, ym / 1e6))
    return rows


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "doc_id long, page int, xc double, yc double"
    )
    return {
        (r["doc_id"], r["page"]): (r["n_words"], r["slope_ppm"], r["n_lines"])
        for r in estimate_skew(df, **kw).collect()
    }


def test_recovers_planted_slope_and_lines(spark):
    got = _run(spark, _grid(1, 40_000) + _grid(2, -25_000) + _grid(3, 0))
    for doc, slope in [(1, 40_000), (2, -25_000), (3, 0)]:
        n_words, slope_ppm, n_lines = got[(doc, 0)]
        assert n_words == 30
        # balanced grid: LS recovers the planted slope up to the
        # micro-truncation of the synthesis shear (<= 1 ppm here)
        assert abs(slope_ppm - slope) <= 1, (doc, slope_ppm)
        assert n_lines == 5


def test_skew_interleaves_rows_deskew_recovers(spark):
    # at 50000 ppm over a 6in width the baseline drifts 0.3in — a full
    # line pitch: naive y-clustering undercounts, deskewed is exact
    rows = _grid(1, 50_000, n_lines=4)
    df = spark.createDataFrame(
        rows, "doc_id long, page int, xc double, yc double"
    )
    naive = (
        df.select((F.round(F.col("yc") * 1e6)).cast("long").alias("ym"))
        .distinct()
        .count()
    )
    got = _run(spark, rows)
    assert got[(1, 0)][2] == 4  # deskewed: the 4 printed lines
    # sanity: the raw y values really did smear across the page
    assert naive > 4


def test_single_word_page(spark):
    got = _run(spark, [(1, 0, 3.0, 2.0)])
    assert got[(1, 0)] == (1, 0, 1)


def test_vertical_stack_zero_variance(spark):
    # all words share x: den = 0 -> slope 0, lines = distinct y gaps
    rows = [(1, 0, 2.0, 1.0 + 0.3 * l) for l in range(3)]
    got = _run(spark, rows)
    assert got[(1, 0)] == (3, 0, 3)


def test_partitioning_invariant(spark):
    rows = _grid(1, 33_000, n_lines=6)
    df = spark.createDataFrame(
        rows, "doc_id long, page int, xc double, yc double"
    )
    a = estimate_skew(df.repartition(1)).collect()[0]
    b = estimate_skew(df.repartition(16)).collect()[0]
    assert (a["slope_ppm"], a["n_lines"]) == (b["slope_ppm"], b["n_lines"])
