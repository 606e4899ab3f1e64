"""Deterministic corpus split + scalable global row numbering
(q71/q72 units)."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F


def _py_split(key: str, salt: str = "split", boundaries=((980_000, "train"), (990_000, "val"))):
    bucket = int(hashlib.md5((key + salt).encode()).hexdigest()[:15], 16) % 1_000_000
    for b, label in boundaries:
        if bucket < b:
            return label
    return "test"


def test_split_assign_matches_python_md5(spark):
    from horus_spark.operators.sampling import split_assign

    keys = [f"doc{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id string")
    got = {
        r["doc_id"]: r["split"]
        for r in split_assign(df, "doc_id").collect()
    }
    assert got == {k: _py_split(k) for k in keys}


def test_split_assign_stable_under_corpus_growth(spark):
    # THE property randomSplit lacks: adding rows never moves a doc
    from horus_spark.operators.sampling import split_assign

    small = spark.createDataFrame([(f"d{i}",) for i in range(100)], "doc_id string")
    big = spark.createDataFrame([(f"d{i}",) for i in range(1000)], "doc_id string")
    a = {r["doc_id"]: r["split"] for r in split_assign(small, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(big, "doc_id").collect()}
    assert all(b[k] == v for k, v in a.items())


def test_split_assign_fractions_and_custom_splits(spark):
    from horus_spark.operators.sampling import split_assign

    df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
    out = split_assign(
        df, "k", {"a": 500_000, "b": 300_000, "c": 200_000}
    )
    frac = {
        r["split"]: r["n"] / 20000
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(frac["a"] - 0.5) < 0.02
    assert abs(frac["b"] - 0.3) < 0.02
    assert abs(frac["c"] - 0.2) < 0.02


def test_split_assign_is_map_side_only(spark):
    from horus_spark.operators.sampling import split_assign

    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    plan = (
        split_assign(df, "k")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_split_assign_rejects_bad_ppm(spark):
    from horus_spark.operators.sampling import split_assign

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        split_assign(df, "k", {"train": 1, "test": 2})


# ------------------------------------------------------------ row numbers


def test_global_row_number_matches_sorted_enumerate(spark):
    from horus_spark.operators.indexing import global_row_number

    vals = [((i * 7919) % 10007,) for i in range(3000)]
    df = spark.createDataFrame(vals, "k long")
    for n_parts in (3, 8):
        rows = global_row_number(df, ["k"], n_parts=n_parts).collect()
        got = sorted((r["k"], r["row_num"]) for r in rows)
        want = [(k, i + 1) for i, (k,) in enumerate(sorted(vals))]
        assert got == want


def test_global_row_number_start_offset(spark):
    from horus_spark.operators.indexing import global_row_number

    df = spark.createDataFrame([(3,), (1,), (2,)], "k long")
    rows = global_row_number(df, ["k"], start=0).collect()
    assert {(r["k"], r["row_num"]) for r in rows} == {(1, 0), (2, 1), (3, 2)}


def test_global_row_number_one_corpus_shuffle_no_global_window(spark):
    """The scale contract: exactly ONE corpus-sized hash exchange (the
    bucket-partitioned window's); every other hash exchange sits above
    a map-side partial count, i.e. carries one row per bucket; there is
    no range exchange and no EMPTY-partition-spec window (the
    single-task bottleneck this operator exists to avoid)."""
    from horus_spark.operators.indexing import global_row_number

    df = spark.range(5000).select(F.col("id").alias("k"))
    out = global_row_number(df, ["k"], n_parts=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange rangepartitioning" not in final
    corpus_exchanges = 0
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*\n([^\n]*)", final):
        if "partial_count" not in m.group(1):
            corpus_exchanges += 1
    assert corpus_exchanges == 1
    # the numbering window is partitioned by the bucket, never empty
    assert "windowspecdefinition(_bucket" in final


def test_global_row_number_consumers_agree_multi_column(spark):
    """Regression for the first-draft bug the sf0.01 oracle caught:
    with a multi-column frame, column pruning made the counts and
    numbering subtrees non-identical, exchange reuse didn't fire, and
    the range partitioner drew DIFFERENT boundaries per subtree —
    silently wrong numbers. Value-determined buckets cannot disagree."""
    from horus_spark.operators.indexing import global_row_number

    rows = [((i * 7919) % 10007, f"u{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "k long, payload string").repartition(16)
    got = sorted(
        (r["k"], r["row_num"])
        for r in global_row_number(df, ["k"], n_parts=8).collect()
    )
    assert got == [(k, i + 1) for i, (k, _) in enumerate(sorted(rows))]


def test_global_row_number_degenerate_and_negative_keys(spark):
    from horus_spark.operators.indexing import global_row_number

    # all-equal leading key: one bucket, ties broken by the second col
    df = spark.createDataFrame(
        [(0, "b"), (0, "a"), (0, "c")], "k long, t string"
    )
    rows = global_row_number(df, ["k", "t"]).collect()
    assert {(r["t"], r["row_num"]) for r in rows} == {("a", 1), ("b", 2), ("c", 3)}
    # negative and float-ish extents
    df2 = spark.createDataFrame([(-50,), (-1,), (99,), (0,)], "k long")
    rows2 = global_row_number(df2, ["k"]).collect()
    assert {(r["k"], r["row_num"]) for r in rows2} == {
        (-50, 1), (-1, 2), (0, 3), (99, 4)
    }


def test_global_row_number_null_key_fails_loudly(spark):
    # a NULL leading key has no position in a total order; it must
    # error, not silently vanish in the offsets join
    from horus_spark.operators.indexing import global_row_number

    df = spark.createDataFrame([(1,), (None,), (3,)], "k long")
    with pytest.raises(Exception) as exc:
        global_row_number(df, ["k"]).collect()
    assert "NULL" in str(exc.value)


def test_global_row_number_rejects_empty_order(spark):
    from horus_spark.operators.indexing import global_row_number

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        global_row_number(df, [])


# ---------------------------------------------------------- epoch shuffle


def test_epoch_shuffle_matches_python_and_is_reproducible(spark):
    from horus_spark.operators.indexing import epoch_shuffle

    ids = [f"d{i}" for i in range(300)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")

    def py_order(epoch):
        keyed = sorted(
            ids,
            key=lambda s: (
                int(
                    hashlib.md5((s + f"epoch{epoch}").encode()).hexdigest()[:15],
                    16,
                ),
                s,
            ),
        )
        return {s: i + 1 for i, s in enumerate(keyed)}

    got1 = {
        r["doc_id"]: r["shuffle_pos"]
        for r in epoch_shuffle(df, "doc_id", epoch=1).collect()
    }
    assert got1 == py_order(1)
    # same epoch again -> identical permutation (reproducible/resumable)
    got1b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in epoch_shuffle(df.repartition(16), "doc_id", epoch=1).collect()
    }
    assert got1b == got1
    # a different epoch -> a genuinely different permutation
    got2 = {
        r["doc_id"]: r["shuffle_pos"]
        for r in epoch_shuffle(df, "doc_id", epoch=2).collect()
    }
    assert got2 == py_order(2)
    assert got2 != got1
    # both are complete permutations of 1..n
    assert sorted(got1.values()) == list(range(1, 301))
    assert sorted(got2.values()) == list(range(1, 301))


def test_curriculum_order(spark):
    import hashlib

    from pyspark.sql import functions as F

    from horus_spark.operators.indexing import curriculum_order

    rows = [(f"d{i:02d}", "g%d" % (i % 2), i * 10) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, source string, q long")
    out = curriculum_order(df, "q", "source", n_stages=4, epoch=1).collect()
    got = {r["id"]: r.asDict() for r in out}
    # python replay: per-group percentile -> stage -> (stage, hash, id)
    by_g: dict[str, list] = {}
    for d, g, q in rows:
        by_g.setdefault(g, []).append((q, d))
    pct = {}
    for g, items in by_g.items():
        items.sort()
        n = len(items)
        for rnk, (q, d) in enumerate(items):
            pct[d] = rnk * 1_000_000 // max(n - 1, 1)
    def hk(d):
        return int(hashlib.md5(f"{d}epoch1".encode()).hexdigest()[:15], 16)
    order = sorted(
        rows,
        key=lambda r: (min(pct[r[0]] * 4 // 1_000_000, 3), hk(r[0]), r[0]),
    )
    for pos, (d, g, q) in enumerate(order, start=1):
        assert got[d]["curriculum_pos"] == pos, d
        assert got[d]["stage"] == min(pct[d] * 4 // 1_000_000, 3)
    # stage monotonicity: every stage-k row precedes stage-k+1 rows
    seq = sorted(out, key=lambda r: r["curriculum_pos"])
    stages = [r["stage"] for r in seq]
    assert stages == sorted(stages)
