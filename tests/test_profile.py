"""One-pass column profiler: hand-computed stats, the exact-vs-approx
plan shapes (Expand only in the exact tier), empty-table totals, and the
column guards."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from horus_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [
            (1, "a", None),
            (2, "a", 10.0),
            (2, None, 20.0),
            (3, "b", 20.0),
            (None, "b", 30.0),
        ],
        "k long, s string, v double",
    )


def test_profile_values(table):
    got = {r["col_name"]: r.asDict() for r in profile_table(table).collect()}
    assert set(got) == {"k", "s", "v"}
    assert got["k"] == {
        "col_name": "k", "n_rows": 5, "n_nulls": 1, "n_distinct": 3,
        "min_value": "1", "max_value": "3",
    }
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2
    assert got["s"]["min_value"] == "a"
    assert got["s"]["max_value"] == "b"
    assert got["v"]["n_distinct"] == 3  # NULL excluded, dup collapsed


def test_profile_single_aggregation_plans(table):
    """Exact tier goes through the multi-distinct Expand; the approx
    (100-TB) tier must NOT expand — one plain pass."""
    exact_plan = (
        profile_table(table)._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        profile_table(table, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan


def test_profile_approx_counts_are_close(table):
    exact = {
        r["col_name"]: r["n_distinct"] for r in profile_table(table).collect()
    }
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profile_table(table, exact=False).collect()
    }
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(1, int(0.1 * n))


def test_profile_empty_table(spark):
    empty = spark.createDataFrame([], "k long, s string")
    got = {r["col_name"]: r.asDict() for r in profile_table(empty).collect()}
    assert got["k"]["n_rows"] == 0
    assert got["k"]["n_nulls"] == 0
    assert got["k"]["n_distinct"] == 0
    assert got["k"]["min_value"] is None
    assert got["s"]["max_value"] is None


def test_profile_guards(table):
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(table, ["k", "nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_table(table, [])


def test_pairwise_moments_hand_values(spark):
    import pytest
    from pyspark.sql import functions as F

    from horus_spark.operators.profile import pairwise_moments

    df = spark.createDataFrame(
        [(1.0, 2.0, None), (2.5, 1.5, 3.0), (0.5, None, 1.0)],
        "x double, y double, z double",
    )
    rows = {
        (r["col_a"], r["col_b"]): r.asDict()
        for r in pairwise_moments(df, ["x", "y", "z"]).collect()
    }
    xy = rows[("x", "y")]
    # pairwise-complete: row 3 (y NULL) excluded
    assert xy["n"] == 2
    assert int(xy["sum_a"]) == 350 and int(xy["sum_b"]) == 350
    assert int(xy["sum_aa"]) == 72500 and int(xy["sum_bb"]) == 62500
    assert int(xy["sum_ab"]) == 57500
    yz = rows[("y", "z")]
    assert yz["n"] == 1 and int(yz["sum_ab"]) == 45000
    with pytest.raises(ValueError):
        pairwise_moments(df, ["x"])


def test_pairwise_moments_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from horus_spark.operators.profile import pairwise_moments

    df = spark.range(0, 1000).select(
        (F.col("id") * 0.25).alias("a"), (F.col("id") % 7 * 1.5).alias("b")
    )
    one = {
        tuple(r)
        for r in pairwise_moments(df.repartition(1), ["a", "b"]).collect()
    }
    many = {
        tuple(r)
        for r in pairwise_moments(
            df.repartition(16, F.col("b")), ["a", "b"]
        ).collect()
    }
    assert one == many
