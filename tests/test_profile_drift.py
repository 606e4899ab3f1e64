"""profile_drift: every verdict class on a hand-built pair of
profiles, exact ppm arithmetic, range-only drift, guards."""

import pytest

from horus_spark.operators.profile import profile_drift, profile_table

SCHEMA = (
    "col_name string, n_rows long, n_nulls long, n_distinct long, "
    "min_value string, max_value string"
)


def _p(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_verdicts_and_arithmetic(spark):
    old = _p(
        spark,
        [
            ("stable_c", 1000, 10, 500, "a", "z"),
            ("nullcreep", 1000, 10, 500, "a", "z"),
            ("collapsed", 1000, 0, 900, "a", "z"),
            ("range_c", 1000, 0, 500, "a", "z"),
            ("gone", 1000, 0, 5, "a", "z"),
        ],
    )
    new = _p(
        spark,
        [
            ("stable_c", 2000, 21, 700, "a", "z"),  # 10500 vs 10000 ppm
            ("nullcreep", 2000, 100, 500, "a", "z"),  # 50000 ppm
            ("collapsed", 1000, 0, 3, "a", "z"),  # ratio 3333 ppm
            ("range_c", 1000, 0, 500, "a", "zz"),
            ("fresh", 1000, 0, 5, "a", "z"),
        ],
    )
    got = {
        r.col_name: (
            r.status,
            r.null_delta_ppm,
            r.distinct_ratio_ppm,
            r.range_changed,
        )
        for r in profile_drift(old, new).collect()
    }
    assert got["stable_c"] == ("stable", 500, 1_400_000, False)
    assert got["nullcreep"] == ("drift", 40_000, 1_000_000, False)
    assert got["collapsed"] == ("drift", 0, 3_333, False)
    assert got["range_c"] == ("drift", 0, 1_000_000, True)
    assert got["gone"] == ("dropped", None, None, False)
    assert got["fresh"] == ("added", None, None, False)


def test_composes_with_profile_table(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "id long, s string"
    )
    b = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "x")], "id long, tag string"
    )
    got = {
        r.col_name: r.status
        for r in profile_drift(
            profile_table(a), profile_table(b)
        ).collect()
    }
    # id: null rate 0 both; distinct 3 -> 4 (ratio 1.33M ok); max 3 -> 4
    assert got["id"] == "drift"
    assert got["s"] == "dropped"
    assert got["tag"] == "added"


def test_guard(spark):
    p = _p(spark, [("c", 1, 0, 1, "a", "a")])
    with pytest.raises(ValueError):
        profile_drift(p, p, distinct_lo_ppm=0)
