"""Tests for the as-of (point-in-time) join and the bucketized interval
join — differential against pandas.merge_asof / a naive quadratic
reference, plus the plan properties that make them scale."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from horus_spark.operators.asof import asof_join
from horus_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2024, 1, 1)


def _rand_events(rng, n, n_keys, max_s):
    # distinct timestamps per key to keep merge_asof tie-free
    seen = set()
    rows = []
    while len(rows) < n:
        k = rng.randrange(n_keys)
        s = rng.randrange(max_s)
        if (k, s) in seen:
            continue
        seen.add((k, s))
        rows.append((len(rows), k, T0 + dt.timedelta(seconds=s), float(rng.randrange(100))))
    return rows


def test_asof_join_differential_vs_pandas(spark):
    rng = random.Random(17)
    left_rows = _rand_events(rng, 300, 8, 5000)
    right_rows = _rand_events(rng, 200, 8, 5000)
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        right_rows, "r_id long, user_id long, ts timestamp, r_value double"
    )
    got = {
        r.event_id: (r.asof_r_id, r.asof_r_value)
        for r in asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts"
        ).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts", "value"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["r_id", "user_id", "ts", "r_value"]).sort_values("ts")
    exp = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward", allow_exact_matches=True
    )
    assert len(got) == 300
    for _, row in exp.iterrows():
        g = got[row.event_id]
        if pd.isna(row.r_id):
            assert g == (None, None), row.event_id
        else:
            assert g == (row.r_id, row.r_value), row.event_id


def test_asof_join_inclusive_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, T0 + dt.timedelta(seconds=100))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 1, T0 + dt.timedelta(seconds=100)),  # exact tie -> matches
            (11, 1, T0 + dt.timedelta(seconds=99)),
        ],
        "r_id long, user_id long, ts timestamp",
    )
    out = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts").collect()
    assert out[0].asof_r_id == 10  # inclusive: the equal-ts row wins

    # tolerance: only matches within the window survive
    left2 = spark.createDataFrame(
        [(2, 1, T0 + dt.timedelta(seconds=500))], "event_id long, user_id long, ts timestamp"
    )
    out2 = asof_join(
        left2, right, on=["user_id"], left_ts="ts", right_ts="ts",
        tolerance=F.expr("INTERVAL 60 SECONDS"),
    ).collect()
    assert out2[0].asof_r_id is None  # 400s gap > 60s tolerance


def test_asof_join_single_shuffle(spark):
    left = spark.createDataFrame([(1, 1, T0)], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(2, 1, T0)], "r_id long, user_id long, ts timestamp")
    plan = (
        asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union-and-carry: exactly one hash exchange (the window's), zero joins
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def _naive_interval_pairs(left_rows, right_rows, width_s):
    out = set()
    for lid, lk, lts in left_rows:
        for rid, rk, rts in right_rows:
            if lk == rk and rts <= lts <= rts + dt.timedelta(seconds=width_s):
                out.add((lid, rid))
    return out


def test_interval_join_differential(spark):
    rng = random.Random(99)
    left_rows = [
        (i, rng.randrange(5), T0 + dt.timedelta(seconds=rng.randrange(20000)))
        for i in range(250)
    ]
    right_rows = [
        (i, rng.randrange(5), T0 + dt.timedelta(seconds=rng.randrange(20000)))
        for i in range(120)
    ]
    left = spark.createDataFrame(left_rows, "lid long, user_id long, lts timestamp")
    right = spark.createDataFrame(
        right_rows, "rid long, user_id long, rts timestamp"
    ).select(
        "rid", "user_id", F.col("rts").alias("start_ts"),
        (F.col("rts") + F.expr("INTERVAL 900 SECONDS")).alias("end_ts"),
    )
    exp = _naive_interval_pairs(left_rows, right_rows, 900)
    # widths straddling the interval length must all give identical answers
    for width in (100.0, 900.0, 5000.0):
        got = {
            (r.lid, r.rid)
            for r in interval_join(
                left, right, on=["user_id"], left_ts="lts",
                right_start="start_ts", right_end="end_ts", bucket_width_s=width,
            ).collect()
        }
        assert got == exp, width
    assert exp  # the fixture actually produced matches


def test_interval_join_semi_anti_and_validation(spark):
    left = spark.createDataFrame(
        [(1, 1, T0), (2, 1, T0 + dt.timedelta(hours=9))],
        "lid long, user_id long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(7, 1, T0 - dt.timedelta(minutes=1), T0 + dt.timedelta(minutes=1))],
        "rid long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    kw = dict(on=["user_id"], left_ts="lts", right_start="start_ts",
              right_end="end_ts", bucket_width_s=60.0)
    semi = interval_join(left, right, how="left_semi", **kw).collect()
    assert [r.lid for r in semi] == [1]
    anti = interval_join(left, right, how="left_anti", **kw).collect()
    assert [r.lid for r in anti] == [2]
    with pytest.raises(ValueError, match="rename clashing"):
        interval_join(left, left.withColumnRenamed("lid", "x"), **kw)
    with pytest.raises(ValueError, match="bucket_width_s"):
        interval_join(left, right, **{**kw, "bucket_width_s": 0})


def test_interval_join_is_hash_equi_join(spark):
    left = spark.createDataFrame([(1, 1, T0)], "lid long, user_id long, lts timestamp")
    right = spark.createDataFrame(
        [(7, 1, T0, T0 + dt.timedelta(minutes=5))],
        "rid long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    plan = (
        interval_join(
            left, right, on=["user_id"], left_ts="lts",
            right_start="start_ts", right_end="end_ts", bucket_width_s=300.0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_rejects_submicrosecond_width(spark):
    from horus_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [("k", "2026-01-01 00:00:00")], "key string, ts string"
    ).selectExpr("key", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [("k", "2026-01-01 00:00:00", "2026-01-01 01:00:00")],
        "key string, start string, end string",
    ).selectExpr(
        "key", "cast(start as timestamp) as start", "cast(end as timestamp) as end"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="below 1 microsecond"):
        interval_join(
            left, right, on=["key"], left_ts="ts", right_start="start",
            right_end="end", bucket_width_s=1e-7,
        )
