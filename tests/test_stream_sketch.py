"""stream_sketch_maintenance: cross-restart batch accumulation, merged
sketch == whole-corpus sketch (additivity), replay idempotence via
batch-keyed overwrite, estimates from the merged sketch."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.sketches import cms_estimate, cms_sketch
from horus_spark.streaming.incremental import (
    _sketch_batch,
    read_sketch,
    stream_sketch_maintenance,
)

D, W = 4, 256

B1 = [("d1", "spark spark join"), ("d2", "window join table")]
B2 = [("d3", "spark window window"), ("d4", "merge table spark")]


def _whole_sketch(spark):
    allrows = spark.createDataFrame(B1 + B2, "doc_id string, text string")
    toks = allrows.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    )
    return cms_sketch(toks, "tok", d=D, w=W)


def test_cross_restart_accumulation_and_additivity(spark, tmp_path):
    src = str(tmp_path / "src")
    skd = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    # file-source streams read a directory of like files; write both
    # waves into one dir, second wave AFTER the first run's checkpoint
    spark.createDataFrame(B1, "doc_id string, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    q = stream_sketch_maintenance(spark, src, skd, ckpt, d=D, w=W)
    q.awaitTermination(60)
    spark.createDataFrame(B2, "doc_id string, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    q2 = stream_sketch_maintenance(spark, src, skd, ckpt, d=D, w=W)
    q2.awaitTermination(60)

    merged = {
        (r.row_i, r.col_j): r.c for r in read_sketch(spark, skd).collect()
    }
    whole = {
        (r.row_i, r.col_j): r.c for r in _whole_sketch(spark).collect()
    }
    assert merged == whole

    # estimates read straight off the merged sketch
    keys = spark.createDataFrame(
        [("spark",), ("window",), ("absent-token",)], "key string"
    )
    est = {
        r.key: r.est
        for r in cms_estimate(
            read_sketch(spark, skd), keys, d=D, w=W
        ).collect()
    }
    assert est["spark"] >= 4 and est["window"] >= 3
    assert est["absent-token"] == 0


def test_replay_overwrites_not_double_counts(spark, tmp_path):
    skd = str(tmp_path / "sketch")
    b = spark.createDataFrame(B1, "doc_id string, text string")
    _sketch_batch(b, 0, skd, D, W)
    once = {
        (r.row_i, r.col_j): r.c for r in read_sketch(spark, skd).collect()
    }
    _sketch_batch(b, 0, skd, D, W)  # replayed micro-batch
    twice = {
        (r.row_i, r.col_j): r.c for r in read_sketch(spark, skd).collect()
    }
    assert once == twice
