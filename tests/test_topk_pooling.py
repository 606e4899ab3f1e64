"""Group-wise top-k + embedding mean-pool (q58/q59 units)."""

import pytest
from pyspark.sql import functions as F


def test_top_k_per_key_values_and_ties(spark):
    from horus_spark.operators.topk import top_k_per_key

    df = spark.createDataFrame(
        [("a", "x1", 10), ("a", "x2", 30), ("a", "x3", 30), ("a", "x4", 5),
         ("b", "y1", 1)],
        "k string, id string, score int",
    )
    rows = top_k_per_key(df, ["k"], "score", k=2, tie_col="id").collect()
    got = {(r["k"], r["rank"]): r["id"] for r in rows}
    # tie at 30 breaks ascending by id
    assert got == {("a", 1): "x2", ("a", 2): "x3", ("b", 1): "y1"}


def test_top_k_per_key_ascending(spark):
    from horus_spark.operators.topk import top_k_per_key

    df = spark.createDataFrame(
        [("a", "x1", 10), ("a", "x2", 3)], "k string, id string, score int"
    )
    [r] = top_k_per_key(df, ["k"], "score", k=1, descending=False, tie_col="id").collect()
    assert r["id"] == "x2"


def test_top_k_plans_as_window_group_limit(spark):
    # the scale property: local top-k pruning BEFORE the exchange
    from horus_spark.operators.topk import top_k_per_key

    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    plan = (
        top_k_per_key(df, ["k"], "v", k=3, tie_col="v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_top_k_rejects_bad_k(spark):
    from horus_spark.operators.topk import top_k_per_key

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError):
        top_k_per_key(df, ["k"], "v", k=0)


def test_mean_pool_values(spark):
    from horus_spark.operators.pooling import mean_pool

    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 6.0]), ("b", [10.0, 0.0])],
        "g string, embedding array<double>",
    )
    got = {r["g"]: (r["n_vecs"], r["centroid"]) for r in mean_pool(df, ["g"]).collect()}
    assert got["a"] == (2, [2.0, 4.0])
    assert got["b"] == (1, [10.0, 0.0])


def test_mean_pool_partitioning_invariant(spark):
    from horus_spark.operators.pooling import mean_pool

    rows = [(f"g{i % 3}", [((i * 7 + j * 13) % 101) / 101.0 for j in range(8)])
            for i in range(90)]
    df = spark.createDataFrame(rows, "g string, embedding array<double>")
    one = sorted(map(tuple, mean_pool(df.coalesce(1), ["g"]).collect()))
    many = sorted(map(tuple, mean_pool(df.repartition(16), ["g"]).collect()))
    assert one == many


def test_mean_pool_ragged_dims_raise(spark):
    from horus_spark.operators.pooling import mean_pool

    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0])], "g string, embedding array<double>"
    )
    with pytest.raises(Exception, match="ragged, empty, or NULL"):
        mean_pool(df, ["g"]).collect()


def test_mean_pool_rejects_empty_and_null_vectors(spark):
    # posexplode silently drops empty/NULL arrays; the guard must not
    from horus_spark.operators.pooling import mean_pool

    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [])],
        "k string, embedding array<double>",
    )
    with pytest.raises(Exception) as exc:
        mean_pool(df, ["k"]).collect()
    assert "empty" in str(exc.value) or "ragged" in str(exc.value)

    df2 = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", None)],
        "k string, embedding array<double>",
    )
    with pytest.raises(Exception):
        mean_pool(df2, ["k"]).collect()
