"""Incremental view maintenance over the snapshot catalog (operators/ivm.py, q136)."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.ivm import (
    apply_delta,
    delta_aggregate,
    maintain_view,
    view_from_table,
)

KEYS = ["g"]
SUMS = {"total": "v"}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "id long, g long, v long")


@pytest.fixture()
def store(spark, tmp_path):
    from horus_spark.sources.sink import append_chunk, merge_upsert

    out = str(tmp_path / "store")
    # snapshots 1-3: appends
    append_chunk(
        out, {"t": _rows(spark, [(1, 1, 10), (2, 1, 20), (3, 2, 5)])}, run_id="s1"
    )
    append_chunk(out, {"t": _rows(spark, [(4, 2, 7), (5, 3, 100)])}, run_id="s2")
    append_chunk(out, {"t": _rows(spark, [(6, 1, 1), (7, 4, 4)])}, run_id="s3")
    # snapshot 4: update id=4 (g=2) v 7 -> 70, insert a brand-new g=5 row
    merge_upsert(
        spark,
        out,
        "t",
        _rows(spark, [(4, 2, 70), (99, 5, 50)]),
        ["id"],
    )
    return out


def _snapshot_view(spark, out, snap):
    from horus_spark.sources.sink import read_output

    t = read_output(spark, out, "t", snapshot=snap)
    if "chunk" in t.columns:
        t = t.drop("chunk")
    return view_from_table(t, KEYS, SUMS)


def _as_dict(df):
    return {r["g"]: (r["total"], r["n_rows"]) for r in df.collect()}


def test_incremental_matches_recompute_at_every_snapshot(spark, store):
    from horus_spark.sources.sink import list_snapshots

    snaps = list_snapshots(store)
    state = _snapshot_view(spark, store, snaps[0])
    for a, b in zip(snaps, snaps[1:]):
        state = maintain_view(spark, store, "t", KEYS, SUMS, state, a, b)
        assert _as_dict(state) == _as_dict(_snapshot_view(spark, store, b)), (
            f"IVM state diverged from full recompute at snapshot {b}"
        )


def test_group_vanishes_when_rows_reach_zero(spark, store):
    from horus_spark.sources.sink import delete_rows, list_snapshots

    snaps = list_snapshots(store)
    state = _snapshot_view(spark, store, snaps[-1])
    # delete every g=3 row: the group must DISAPPEAR from the view,
    # not linger with total 0
    delete_rows(
        spark,
        store,
        "t",
        spark.createDataFrame([(3,)], "g long"),
        ["g"],
    )
    new_snap = list_snapshots(store)[-1]
    state = maintain_view(
        spark, store, "t", KEYS, SUMS, state, snaps[-1], new_snap
    )
    d = _as_dict(state)
    assert 3 not in d
    assert d == _as_dict(_snapshot_view(spark, store, new_snap))


def test_maintenance_reads_only_changed_chunks(spark, store):
    from horus_spark.sources.sink import (
        _snapshot_chunks,
        list_snapshots,
        snapshot_diff,
    )

    snaps = list_snapshots(store)
    # snapshot 2 -> 3 touched exactly one chunk (the s3 append); the
    # changelog scan must not read the s1/s2 chunks at all
    delta = snapshot_diff(spark, store, "t", snaps[1], snaps[2])
    files = delta.inputFiles()
    assert files, "append delta should read the new chunk"
    unchanged = set(_snapshot_chunks(store, snaps[1])) & set(
        _snapshot_chunks(store, snaps[2])
    )
    for f in files:
        assert not any(f"/{c}/" in f for c in unchanged), (
            f"changelog scan read an unchanged chunk: {f}"
        )


def test_update_shifts_sum_not_count(spark, store):
    from horus_spark.sources.sink import list_snapshots

    snaps = list_snapshots(store)
    before = _as_dict(_snapshot_view(spark, store, snaps[-2]))
    state = maintain_view(
        spark,
        store,
        "t",
        KEYS,
        SUMS,
        _snapshot_view(spark, store, snaps[-2]),
        snaps[-2],
        snaps[-1],
    )
    after = _as_dict(state)
    # g=2: 7 -> 70 (sum +63, count unchanged); g=5 is brand new
    assert after[2] == (before[2][0] + 63, before[2][1])
    assert after[5] == (50, 1)


def test_unknown_change_type_raises_lazily(spark):
    delta = spark.createDataFrame(
        [(1, 10, "upsert")], "g long, v long, change_type string"
    )
    agg = delta_aggregate(delta, KEYS, SUMS)
    with pytest.raises(Exception, match="unknown change_type"):
        agg.collect()


def test_negative_row_count_raises(spark):
    # a delete-only changelog applied to a state that never held the
    # row is a snapshot lineage mismatch and must fail loudly, not
    # silently produce a -1-row group
    delta = spark.createDataFrame(
        [(1, 10, "delete")], "g long, v long, change_type string"
    )
    agg = delta_aggregate(delta, KEYS, SUMS)
    state = view_from_table(_rows(spark, [(1, 2, 1)]), KEYS, SUMS)
    with pytest.raises(Exception, match="negative row count"):
        apply_delta(state, agg, KEYS, ["total"]).collect()


def test_reserved_alias_rejected(spark):
    delta = spark.createDataFrame(
        [(1, 10, "insert")], "g long, v long, change_type string"
    )
    with pytest.raises(ValueError, match="reserved"):
        delta_aggregate(delta, KEYS, {"n_rows": "v"})


def test_null_values_cancel(spark, tmp_path):
    from horus_spark.sources.sink import append_chunk, delete_rows, list_snapshots

    out = str(tmp_path / "nullstore")
    df = _rows(spark, [(1, 1, None), (2, 1, 3)])
    append_chunk(out, {"t": df}, run_id="n1")
    state = view_from_table(df, KEYS, SUMS)
    # deleting the NULL-valued row must drop the count without
    # disturbing the sum (SUM ignores NULL on both the recompute and
    # the signed-delta path)
    delete_rows(spark, out, "t", spark.createDataFrame([(1,)], "id long"), ["id"])
    snaps = list_snapshots(out)
    state = maintain_view(spark, out, "t", KEYS, SUMS, state, snaps[0], snaps[-1])
    assert _as_dict(state) == {1: (3, 1)}
