"""salted_join: identical answers to a plain join, with one hot key's work
provably spread across salt sub-keys."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.skew import SALT_COL, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 'whale' carries 5000 of 5600 fact rows
    fact = spark.createDataFrame(
        [("whale", i) for i in range(5000)]
        + [(f"u{i % 200}", i) for i in range(600)],
        "user_id string, amount long",
    )
    dim = spark.createDataFrame(
        [("whale", "vip")] + [(f"u{i}", "std") for i in range(200)],
        "user_id string, tier string",
    )
    return fact.cache(), dim.cache()


def test_same_answer_as_plain_join(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "user_id").groupBy("user_id", "tier").agg(
        F.count("*").alias("n"), F.sum("amount").alias("s")
    )
    salted = salted_join(fact, dim, on="user_id", n_salts=8).groupBy(
        "user_id", "tier"
    ).agg(F.count("*").alias("n"), F.sum("amount").alias("s"))
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_left_join_and_differing_key_names(skewed):
    fact, dim = skewed
    fact2 = fact.withColumnRenamed("user_id", "uid")
    out = salted_join(
        fact2, dim, on_left="uid", on_right="user_id", n_salts=4, how="left"
    )
    assert out.count() == fact.count()  # left join keeps unmatched fact rows
    assert "user_id" not in out.columns and SALT_COL not in out.columns
    # unmatched keys (none here all match) -> try one unmatched
    extra = fact2.union(
        fact2.sparkSession.createDataFrame([("nobody", 1)], "uid string, amount long")
    )
    out2 = salted_join(extra, dim, on_left="uid", on_right="user_id", how="left")
    assert out2.filter(F.col("uid") == "nobody").collect()[0].tier is None


def test_hot_key_spread_across_salts(skewed):
    """The point of salting: the whale's rows hash to n_salts distinct join
    sub-keys (plain join: exactly one reducer key)."""
    fact, dim = skewed
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int")
    )
    n_subkeys = (
        salted_fact.filter(F.col("user_id") == "whale")
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert n_subkeys == 8


def test_salt_column_collision_raises(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="already present"):
        salted_join(fact.withColumn(SALT_COL, F.lit(0)), dim, on="user_id")
    with pytest.raises(ValueError, match="on_left"):
        salted_join(fact, dim)


def test_outer_modes_rejected(skewed):
    """right/full outer would emit each unmatched dim key n_salts times
    (one per replica) — salting is only result-preserving when unmatched
    rows come from the fact side, so those modes must raise."""
    fact, dim = skewed
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="does not support"):
            salted_join(fact, dim, on="user_id", how=how)
