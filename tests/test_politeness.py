"""Politeness scheduler: exact sequencing/offsets, host-sticky workers,
delay fallback, priority order, worker_load makespans, guards."""

import hashlib

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.politeness import schedule_fetches, worker_load

NW = 8


def _worker(host: str) -> int:
    return int(
        hashlib.md5((host + "worker").encode()).hexdigest()[:15], 16
    ) % NW


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        ("a.com", "https://a.com/1", 5),
        ("a.com", "https://a.com/2", 9),
        ("a.com", "https://a.com/3", 9),
        ("b.org", "https://b.org/x", 1),
        ("b.org", "https://b.org/y", 2),
        ("c.net", "https://c.net/only", 7),
    ]
    return spark.createDataFrame(rows, "host string, url string, indegree int")


def test_sequencing_offsets_and_sticky_workers(spark, frontier):
    delays = spark.createDataFrame(
        [("a.com", 2000), ("b.org", 500)], "host string, delay_ms int"
    )
    got = {
        r.url: r
        for r in schedule_fetches(
            frontier, delays, n_workers=NW, default_delay_ms=1000
        ).collect()
    }
    # a.com: indegree desc, url asc -> /2 (9), /3 (9), /1 (5)
    assert (got["https://a.com/2"].seq, got["https://a.com/2"].fetch_offset_ms) == (0, 0)
    assert (got["https://a.com/3"].seq, got["https://a.com/3"].fetch_offset_ms) == (1, 2000)
    assert (got["https://a.com/1"].seq, got["https://a.com/1"].fetch_offset_ms) == (2, 4000)
    # b.org uses its 500ms delay; c.net falls back to the default
    assert got["https://b.org/y"].fetch_offset_ms == 0
    assert got["https://b.org/x"].fetch_offset_ms == 500
    assert got["https://c.net/only"].delay_ms == 1000
    # host-sticky md5 workers
    for r in got.values():
        assert r.worker == _worker(r.host)


def test_worker_load_makespan(spark, frontier):
    delays = spark.createDataFrame(
        [("a.com", 2000)], "host string, delay_ms int"
    )
    sched = schedule_fetches(
        frontier, delays, n_workers=NW, default_delay_ms=100
    )
    load = {r.worker: r for r in worker_load(sched).collect()}
    wa = _worker("a.com")
    # a.com: last offset 4000 + delay 2000 = 6000 horizon on its worker
    assert load[wa].horizon_ms >= 6000
    assert sum(r.n_urls for r in load.values()) == 6
    hosts = {"a.com", "b.org", "c.net"}
    assert sum(r.n_hosts for r in load.values()) == len(
        {_worker(h) for h in hosts}
    ) or sum(r.n_hosts for r in load.values()) == 3


def test_no_priority_column_orders_by_url(spark):
    df = spark.createDataFrame(
        [("h", "https://h/z"), ("h", "https://h/a")], "host string, url string"
    )
    got = {
        r.url: r.seq
        for r in schedule_fetches(df, priority_col=None).collect()
    }
    assert got == {"https://h/a": 0, "https://h/z": 1}


def test_guards(spark, frontier):
    with pytest.raises(ValueError):
        schedule_fetches(frontier, n_workers=0)
    with pytest.raises(ValueError):
        schedule_fetches(frontier, default_delay_ms=-1)
