"""CUBE / transition / cohort query-level units (q132-q134)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_cube_is_single_pass(spark):
    # Spark lowers cube() to ONE Expand + hash agg: exactly one
    # shuffle, no per-plane re-scan/union
    df = spark.createDataFrame(
        [("en", "a", 3), ("en", "b", 4), ("de", "a", 5)], ["lang", "source", "n"]
    )
    out = df.cube("lang", "source").agg(F.sum("n").alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Expand" in plan
    rows = {
        (r["lang"], r["source"]): r["s"] for r in out.collect()
    }
    assert rows[(None, None)] == 12  # grand total
    assert rows[("en", None)] == 7
    assert rows[(None, "a")] == 8


def test_event_transitions_hand_case(spark):
    rows = [
        (1, 1, "view"), (1, 2, "cart"), (1, 3, "buy"),
        (2, 4, "view"), (2, 5, "cart"), (2, 6, "view"),
    ]
    e = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    e = e.withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=F.col("event_id")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy("event_type", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["event_type"], r["nxt"]): r["n"] for r in pairs.collect()}
    assert got == {("view", "cart"): 2, ("cart", "buy"): 1, ("cart", "view"): 1}


def test_cohort_day_offset_arithmetic(spark):
    rows = [
        (1, "2026-01-01 10:00:00"),
        (1, "2026-01-03 09:00:00"),
        (2, "2026-01-02 23:59:59"),
    ]
    e = spark.createDataFrame(rows, "user_id long, s string").select(
        "user_id", F.to_timestamp("s").alias("ts")
    )
    day = (F.unix_timestamp("ts") / 86400).cast("long")
    ev = e.select("user_id", day.alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("c"))
    off = (
        ev.join(first, "user_id")
        .select("user_id", (F.col("d") - F.col("c")).alias("off"))
        .collect()
    )
    got = sorted((r["user_id"], r["off"]) for r in off)
    assert got == [(1, 0), (1, 2), (2, 0)]
