"""Incremental/changelog read between snapshots (sink.snapshot_diff, q131)."""

import pytest
from pyspark.sql import functions as F


def _orders(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


@pytest.fixture()
def store(spark, tmp_path):
    from horus_spark.sources.sink import append_chunk

    out = str(tmp_path / "store")
    append_chunk(out, {"t": _orders(spark, [(1, "a"), (2, "b")])}, run_id="s1")
    append_chunk(out, {"t": _orders(spark, [(3, "c"), (4, "d")])}, run_id="s2")
    return out


def _diff(spark, out, a, b):
    from horus_spark.sources.sink import snapshot_diff

    return sorted(
        (r["k"], r["v"], r["change_type"])
        for r in snapshot_diff(spark, out, "t", a, b).collect()
    )


def test_pure_append_is_insert_only(spark, store):
    assert _diff(spark, store, 1, 2) == [(3, "c", "insert"), (4, "d", "insert")]


def test_same_snapshot_empty(spark, store):
    assert _diff(spark, store, 2, 2) == []


def test_update_surfaces_as_delete_insert_pair(spark, store):
    from horus_spark.sources.sink import merge_upsert

    # rewrite touches the chunk holding k=2; k=1 is carried over and
    # must CANCEL between the removed and replacement chunks
    merge_upsert(spark, store, "t", _orders(spark, [(2, "B!")]), ["k"])
    assert _diff(spark, store, 2, 3) == [
        (2, "B!", "insert"),
        (2, "b", "delete"),
    ]


def test_delete_surfaces_as_delete(spark, store):
    from horus_spark.sources.sink import delete_rows

    delete_rows(spark, store, "t", _orders(spark, [(3, "x")]).select("k"), ["k"])
    assert _diff(spark, store, 2, 3) == [(3, "c", "delete")]


def test_compaction_diffs_to_zero(spark, store):
    from horus_spark.sources.sink import compact_chunks, list_snapshots

    res = compact_chunks(spark, store, target_bytes=1 << 30)
    assert res["groups"]
    snaps = list_snapshots(store)
    assert _diff(spark, store, 2, snaps[-1]) == []


def test_cumulative_diff_spans_multiple_commits(spark, store):
    from horus_spark.sources.sink import delete_rows, merge_upsert

    merge_upsert(spark, store, "t", _orders(spark, [(2, "B!"), (9, "new")]), ["k"])
    delete_rows(spark, store, "t", _orders(spark, [(1, "x")]).select("k"), ["k"])
    assert _diff(spark, store, 2, 4) == [
        (1, "a", "delete"),
        (2, "B!", "insert"),
        (2, "b", "delete"),
        (9, "new", "insert"),
    ]


def test_bad_arguments(spark, store):
    from horus_spark.sources.sink import snapshot_diff

    with pytest.raises(ValueError):
        snapshot_diff(spark, store, "t", 2, 1)
    with pytest.raises(ValueError):
        snapshot_diff(spark, store, "t", 1, 99)
