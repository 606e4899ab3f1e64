"""recrawl_schedule: interval formula + clamps, all four tiers, dead
hosts, integer exactness, guards."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.recrawl import recrawl_schedule

SCHEMA = (
    "host string, n_new long, n_gone long, n_modified long, "
    "n_unchanged long, change_ppm long"
)


def _rates(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_formula_tiers_and_clamps(spark):
    rows = [
        # ref churn 10% -> exactly base_hours
        ("at-ref", 1, 0, 0, 9, 100_000),
        # 100% churn -> floor clamp
        ("churny", 10, 0, 0, 0, 1_000_000),
        # 1000 ppm -> 168 * 100 = 16800 -> ceiling clamp, cold tier
        ("static", 0, 0, 1, 999, 1_000),
        # warm band
        ("warm", 0, 0, 5, 95, 50_000),
        # dead: current wave empty (all gone), change_ppm 0
        ("dead", 0, 7, 0, 0, 0),
        # zero churn but alive -> div by max(0,1) -> huge -> ceiling
        ("frozen", 0, 0, 0, 50, 0),
    ]
    got = {
        r.host: (r.tier, r.interval_hours)
        for r in recrawl_schedule(_rates(spark, rows)).collect()
    }
    assert got["at-ref"] == ("warm", 168)
    assert got["churny"] == ("hot", 16)  # 168*100000/1e6 = 16.8 -> 16
    assert got["static"] == ("cold", 720)
    assert got["warm"] == ("warm", 168 * 100_000 // 50_000)
    assert got["dead"] == ("dead", 720)
    assert got["frozen"] == ("cold", 720)


def test_custom_policy_and_guards(spark):
    rows = [("h", 1, 0, 0, 3, 250_000)]
    got = recrawl_schedule(
        _rates(spark, rows),
        base_hours=24,
        ref_ppm=500_000,
        min_hours=1,
        max_hours=48,
    ).collect()[0]
    assert got.interval_hours == 24 * 500_000 // 250_000  # = 48 (at cap)
    with pytest.raises(ValueError):
        recrawl_schedule(_rates(spark, rows), min_hours=0)
    with pytest.raises(ValueError):
        recrawl_schedule(_rates(spark, rows), min_hours=10, max_hours=5)
    with pytest.raises(ValueError):
        recrawl_schedule(_rates(spark, rows), base_hours=0)
