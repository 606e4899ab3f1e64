"""rate_anomalies: planted burst fires, warmup guard, silent-hour
baseline (gap-fill makes a post-silence burst fire), min_count floor,
exact threshold boundary, guards."""

import datetime as dt

import pytest

from horus_spark.operators.anomaly import rate_anomalies

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, event_type string")


def _hours(h, n, typ="a"):
    """n events inside hour h (spread within the hour)."""
    return [
        (T0 + dt.timedelta(hours=h, minutes=(i % 60)), typ)
        for i in range(n)
    ]


def test_burst_fires_and_warmup_guard(spark):
    rows = []
    for h in range(4):  # steady 5/hour for 4 hours
        rows += _hours(h, 5)
    rows += _hours(4, 40)  # 8x burst
    got = {
        r.bucket_start: r
        for r in rate_anomalies(
            _ev(spark, rows),
            trailing=4,
            mult_ppm=2_000_000,
            min_count=10,
        ).collect()
    }
    assert len(got) == 5
    by_hour = sorted(got)
    # hours 0-3: warmup (fewer than 4 predecessors) -> never flagged
    for h in by_hour[:4]:
        assert got[h].flagged is False
        assert got[h].trailing_sum is None
    burst = got[by_hour[4]]
    assert (burst.n_events, burst.trailing_sum, burst.flagged) == (40, 20, True)


def test_silence_counts_in_baseline(spark):
    # 3 quiet hours, 2 SILENT hours, then 12 events: baseline mean =
    # (5+0+0+... ) — silence lowers the mean, so the burst fires
    rows = _hours(0, 2) + _hours(1, 2) + _hours(2, 2) + _hours(5, 12)
    got = sorted(
        rate_anomalies(
            _ev(spark, rows), trailing=3, mult_ppm=2_000_000, min_count=5
        ).collect(),
        key=lambda r: r.bucket_start,
    )
    assert len(got) == 6  # gap-filled hours 3, 4 present
    assert [r.n_events for r in got] == [2, 2, 2, 0, 0, 12]
    last = got[-1]
    # trailing (hours 2,3,4) = 2 + 0 + 0 = 2 -> 12 * 3 > 2x mean -> fire
    assert (last.trailing_sum, last.flagged) == (2, True)


def test_min_count_floor_and_exact_boundary(spark):
    # baseline 2/hour, bump of 4: ratio exactly 2.0x -> strict > means
    # NOT flagged at mult 2.0; and a bump of 5 below min_count=6 is not
    # flagged either even though the ratio exceeds the mult
    rows = []
    for h in range(3):
        rows += _hours(h, 2)
    rows += _hours(3, 4)
    got = sorted(
        rate_anomalies(
            _ev(spark, rows), trailing=3, mult_ppm=2_000_000, min_count=1
        ).collect(),
        key=lambda r: r.bucket_start,
    )
    assert got[-1].flagged is False  # 4 * 3 * 1e6 == 2e6 * 6, not >
    rows2 = []
    for h in range(3):
        rows2 += _hours(h, 1)
    rows2 += _hours(3, 5)
    got2 = sorted(
        rate_anomalies(
            _ev(spark, rows2), trailing=3, mult_ppm=2_000_000, min_count=6
        ).collect(),
        key=lambda r: r.bucket_start,
    )
    assert got2[-1].flagged is False  # ratio 5x but below the floor


def test_guards(spark):
    df = _ev(spark, _hours(0, 3))
    with pytest.raises(ValueError):
        rate_anomalies(df, trailing=0)
    with pytest.raises(ValueError):
        rate_anomalies(df, mult_ppm=1_000_000)
    with pytest.raises(ValueError):
        rate_anomalies(df, min_count=0)
