"""Tests for deterministic sampling / per-key caps / sequence packing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.packing import pack_sequences, packing_stats
from horus_spark.operators.sampling import (
    cap_per_key,
    hash_sample,
    hash_uniform,
    stratified_sample,
)


def _py_uniform(key: str, salt: str = "") -> float:
    return int(hashlib.md5((key + salt).encode()).hexdigest()[:15], 16) / float(
        1 << 60
    )


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(4000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        (F.col("id") % 7).alias("stratum"),
    )


def test_hash_uniform_matches_python_md5(spark):
    rows = (
        spark.range(50)
        .select(
            F.concat(F.lit("doc"), F.col("id")).alias("key"),
            hash_uniform(F.concat(F.lit("doc"), F.col("id")), "salt!").alias("u"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.u - _py_uniform(r.key, "salt!")) < 1e-15
        assert 0.0 <= r.u < 1.0


def test_hash_sample_rate_determinism_and_composition(spark, keyed):
    s1 = hash_sample(keyed, 0.3, "key", salt="a")
    n1 = s1.count()
    # rate within binomial noise (4000 draws, sd ~ 29)
    assert abs(n1 - 1200) < 150
    # deterministic: identical second evaluation
    assert s1.count() == n1
    # same salt is idempotent (subset already passes the filter)
    assert hash_sample(s1, 0.3, "key", salt="a").count() == n1
    # independent salt composes multiplicatively
    n2 = hash_sample(s1, 0.5, "key", salt="b").count()
    assert abs(n2 - n1 * 0.5) < 100


def test_hash_sample_is_map_side_only(spark, keyed):
    plan = hash_sample(keyed, 0.5, "key")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_rates(spark, keyed):
    out = stratified_sample(
        keyed.withColumn("stratum", F.col("stratum").cast("string")),
        "stratum",
        {"0": 1.0, "1": 0.0, "2": 0.5},
        key_col="key",
        default_rate=0.25,
    )
    got = {r.stratum: r.n for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    per = 4000 // 7
    assert got["0"] >= per - 1  # rate 1.0 keeps everything
    assert "1" not in got  # rate 0.0 drops everything
    assert abs(got["2"] - per * 0.5) < 60
    for s in ("3", "4", "5", "6"):
        assert abs(got[s] - per * 0.25) < 60


def test_cap_per_key(spark):
    df = spark.range(300).select(
        (F.col("id") % 3).alias("key"), F.col("id").alias("v")
    )
    out = cap_per_key(df, ["key"], 5, ["v"]).collect()
    assert len(out) == 15
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r.v)
    for k, vs in by_key.items():
        # first 5 in order: the smallest v for that key
        assert sorted(vs) == [k, k + 3, k + 6, k + 9, k + 12]
    with pytest.raises(ValueError):
        cap_per_key(df, ["key"], 0, ["v"])


def _py_next_fit(items, budget):
    """Reference packer: items = [(id, tokens)] sorted by id."""
    out, seq, pos, run = [], 0, 0, 0
    for i, t in sorted(items):
        if pos > 0 and run + t > budget:
            seq, pos, run = seq + 1, 0, 0
        out.append((i, seq, pos))
        run += t
        pos += 1
    return out


def test_pack_sequences_differential(spark):
    import random

    rng = random.Random(41)
    rows = [(f"d{i:04d}", rng.randint(1, 700)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens int")
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=1000, n_shards=4)
    got = {r.doc_id: (r.shard, r.seq_id, r.seq_pos) for r in packed.collect()}
    assert len(got) == 500  # every doc assigned exactly once

    # group reference rows by the SAME md5 shard and replay next-fit
    by_shard = {}
    for i, t in rows:
        sh = int(hashlib.md5(i.encode()).hexdigest()[:15], 16) % 4
        by_shard.setdefault(sh, []).append((i, t))
    for sh, items in by_shard.items():
        for i, seq, pos in _py_next_fit(items, 1000):
            assert got[i] == (sh, seq, pos), i


def test_pack_sequences_budget_and_oversize(spark):
    df = spark.createDataFrame(
        [("a", 400), ("b", 400), ("c", 400), ("d", 5000), ("e", 100)],
        "doc_id string, n_tokens int",
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=1000, n_shards=1)
    per_seq = {
        r.seq_id: r.total
        for r in packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("total")).collect()
    }
    # a+b fit; c starts seq 1; d oversized alone in seq 2; e in seq 3
    assert per_seq == {0: 800, 1: 400, 2: 5000, 3: 100}
    stats = packing_stats(packed, "n_tokens", 1000).collect()[0]
    assert stats.n_sequences == 4
    assert stats.wasted_tokens == 200 + 600 + 0 + 900


def test_pack_sequences_shuffle_carries_no_payload(spark):
    df = spark.createDataFrame(
        [("a", "x" * 1000, 10)], "doc_id string, text string, n_tokens int"
    )
    plan = (
        pack_sequences(df, "doc_id", "n_tokens", budget=100, n_shards=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the exchange feeding the packer must not carry the text column
    exchange = plan[plan.index("Exchange"):]
    assert "text" not in exchange.split("Scan")[0]


def test_weighted_sample_per_key_differential(spark):
    import math

    from horus_spark.operators.sampling import weighted_sample_per_key

    rows = [(f"d{i:03d}", f"k{i % 3}", float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "id string, key string, w double")
    got = {
        (r.key, r.id) for r in weighted_sample_per_key(df, ["key"], "w", 5, "id", "sx").collect()
    }
    # python replay of the exact formula
    by_key = {}
    for i, k, w in rows:
        u = max(_py_uniform(i, "sx"), 1e-18)
        e = round(-math.log(u) / w, 9)
        by_key.setdefault(k, []).append((e, i))
    exp = set()
    for k, es in by_key.items():
        for _e, i in sorted(es)[:5]:
            exp.add((k, i))
    assert got == exp
    assert len(got) == 15


def test_weighted_sample_zero_weight_excluded(spark):
    from horus_spark.operators.sampling import weighted_sample_per_key

    df = spark.createDataFrame(
        [("a", "k", 0.0), ("b", "k", -1.0), ("c", "k", 2.0)],
        "id string, key string, w double",
    )
    out = weighted_sample_per_key(df, ["key"], "w", 10, "id").collect()
    assert [r.id for r in out] == ["c"]


def test_weighted_sample_favors_heavy_rows(spark):
    from horus_spark.operators.sampling import weighted_sample_per_key

    # one row weighted 1000x the rest: across 40 independent salts it
    # must be sampled far more often than a light row
    rows = [("heavy", "k", 1000.0)] + [(f"l{i}", "k", 1.0) for i in range(49)]
    df = spark.createDataFrame(rows, "id string, key string, w double")
    heavy_hits = 0
    for s in range(40):
        ids = {
            r.id
            for r in weighted_sample_per_key(df, ["key"], "w", 1, "id", f"s{s}").collect()
        }
        heavy_hits += "heavy" in ids
    # P(heavy wins) = 1000/1049 per draw; 40 draws -> binomial tail makes
    # < 30 hits astronomically unlikely
    assert heavy_hits >= 30


def test_repetition_stats(spark):
    from horus_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            ("r", "a a a b"),     # 2-grams: [a a, a a, a b] ; 3-grams: [a a a, a a b]
            ("u", "w x y z"),     # all unique
            ("s", "one"),         # too short for any n-gram
            ("e", ""),            # empty
        ],
        "doc_id string, text string",
    )
    got = {r.doc_id: r.asDict() for r in repetition_stats(df).collect()}
    assert got["r"]["top2gram_ratio"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["r"]["dup2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["r"]["top3gram_ratio"] == pytest.approx(0.5, abs=1e-6)
    assert got["r"]["dup3gram_frac"] == 0.0
    assert got["u"]["top2gram_ratio"] == pytest.approx(1 / 3, abs=1e-6)
    assert got["u"]["dup2gram_frac"] == 0.0
    for d in ("s", "e"):
        assert got[d]["top2gram_ratio"] == 0.0
        assert got[d]["dup3gram_frac"] == 0.0
    assert len(got) == 4


def test_pack_sequences_rejects_null_tokens(spark):
    # NaN would silently poison the running total and pack the rest of
    # the shard into one unbounded sequence
    from horus_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [("a", 5), ("b", None), ("c", 7)], "doc_id string, n_tokens int"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="null n_tokens"):
        pack_sequences(df, "doc_id", "n_tokens", budget=16, n_shards=1).collect()


def test_packing_audit_fires_on_planted_corruption(spark):
    """The q195 structural audits must not be vacuous: the real packer
    scores all zeros; each planted corruption trips its own counter."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _packing_audit_frame
    from horus_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(f"d{i:02d}", 200 + 10 * i) for i in range(12)],
        "doc_id string, n_tokens long",
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=512, n_shards=2)

    def audit(p):
        r = _packing_audit_frame(p, budget=512).collect()[0]
        return (
            r.n_start_violations, r.n_transition_violations,
            r.n_budget_violations, r.n_greedy_violations,
        )

    assert audit(packed) == (0, 0, 0, 0)

    # skipped sequence id -> transition violation
    skipped = packed.withColumn(
        "seq_id",
        F.when(F.col("seq_id") >= 1, F.col("seq_id") + 1).otherwise(
            F.col("seq_id")
        ),
    )
    assert audit(skipped)[1] >= 1

    # overfull: fuse everything into one giant sequence per shard
    fused = packed.withColumn("seq_id", F.lit(0)).withColumn(
        "seq_pos",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("shard")
            .orderBy("doc_id")
        )
        - 1,
    )
    assert audit(fused)[2] >= 1  # budget violation

    # premature break (under-packing): every doc its own sequence —
    # transitions stay legal (seq+1, pos 0) but greedy must fire
    solo = packed.withColumn(
        "seq_id",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("shard")
            .orderBy("doc_id")
        )
        - 1,
    ).withColumn("seq_pos", F.lit(0))
    a = audit(solo)
    assert a[3] >= 1 and a[1] == 0
