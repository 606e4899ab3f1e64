"""Crash-injection for the rolling-index streaming ingest
(streaming/incremental._ingest_spans_batch): the non-atomic window
between the batch-keyed VERDICT write and the index-slice EXTEND.

foreachBatch commits the checkpoint only after process_batch returns,
so a crash anywhere inside the batch body replays the WHOLE batch on
restart. These tests kill the batch at the worst point (verdicts
durable, index slice missing), then replay, and prove convergence: no
lost dedup memory, no double verdicts, later batches still catch
duplicates of the crashed batch's docs."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.readwriter import DataFrameWriter

from horus_spark.streaming.incremental import (
    SPANS_SCHEMA,
    _ingest_spans_batch,
)

TEXTS = [f"crash chunk number {i} words" for i in range(14)]


def _doc(did, media_refs, marker=""):
    spans, off = [], 0
    for i, t in enumerate(TEXTS):
        spans.append(("text", marker + t, "", off))
        off += 1
        if i < len(media_refs):
            spans.append(("image", "", media_refs[i], off))
            off += 1
    return (did, spans)


@pytest.fixture()
def store(spark):
    return spark.createDataFrame(
        [("m%d" % i, "p%d" % i) for i in range(6)]
        + [("r%d" % i, "p%d" % i) for i in range(6)],
        "asset_id string, payload string",
    )


def _run(spark, docs, batch_id, store, out, idx):
    batch = spark.createDataFrame(docs, SPANS_SCHEMA)
    _ingest_spans_batch(
        spark, batch, batch_id, store, out, idx,
        k=64, bands=16, threshold=0.5, seed=1337,
    )


def _verdicts(spark, out):
    return {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(os.path.join(out, "batch=*")).collect()
    }


def _inject_index_slice_crash(monkeypatch, idx):
    """Raise on the FINAL index-slice write (not _staging, not
    verdicts) — the exact window the round-4 verdict flagged."""
    orig = DataFrameWriter.parquet

    def boom(self, path, *a, **kw):
        if (
            os.path.abspath(path).startswith(os.path.abspath(idx))
            and "_staging" not in path
        ):
            raise RuntimeError("injected crash: killed before index extend")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)


MX = ["m0", "m1", "m2", "m3", "m4", "m5"]
RX = ["r0", "r1", "r2", "r3", "r4", "r5"]


def test_crash_between_verdicts_and_index_extend(
    spark, tmp_path, store, monkeypatch
):
    out, idx = str(tmp_path / "verdicts"), str(tmp_path / "index")
    _run(spark, [_doc("A", MX)], 0, store, out, idx)
    assert _verdicts(spark, out) == {"A": "unique"}

    # batch 1 crashes AFTER its verdicts land, BEFORE the index extend
    _inject_index_slice_crash(monkeypatch, idx)
    with pytest.raises(RuntimeError, match="injected crash"):
        _run(
            spark,
            [_doc("B", MX, marker="other "), _doc("A2", MX)],
            1, store, out, idx,
        )
    monkeypatch.undo()
    # the torn state the restart sees: batch-1 verdicts durable, batch-1
    # index slice MISSING (B is not yet dedup memory)
    assert os.path.isdir(os.path.join(out, "batch=000001"))
    assert not os.path.isdir(os.path.join(idx, "batch=000001"))

    # restart: the uncommitted checkpoint replays the whole batch
    _run(
        spark,
        [_doc("B", MX, marker="other "), _doc("A2", MX)],
        1, store, out, idx,
    )
    got = _verdicts(spark, out)
    assert got == {"A": "unique", "B": "unique", "A2": "exact_existing"}
    index_ids = {r["id"] for r in spark.read.parquet(idx).collect()}
    assert index_ids == {"A", "B"}  # no lost memory, no dup entries

    # batch 2 proves B's memory survived the crash: a renamed-asset
    # clone of B is caught exact
    _run(spark, [_doc("B2", RX, marker="other ")], 2, store, out, idx)
    assert _verdicts(spark, out)["B2"] == "exact_existing"
    # one verdict row per doc across all batch dirs — replay never
    # double-verdicts
    cnt = (
        spark.read.parquet(os.path.join(out, "batch=*"))
        .groupBy("doc_id").count().collect()
    )
    assert all(r["count"] == 1 for r in cnt)


def test_replay_after_complete_batch_is_idempotent(spark, tmp_path, store):
    # crash AFTER the index extend but BEFORE the checkpoint commit:
    # the replay must exclude its own slice (no self-match erase) and
    # reproduce identical verdicts and index bytes-for-rows
    out, idx = str(tmp_path / "verdicts"), str(tmp_path / "index")
    _run(spark, [_doc("A", MX)], 0, store, out, idx)
    _run(spark, [_doc("B", MX, marker="other ")], 1, store, out, idx)
    before_v = _verdicts(spark, out)
    before_idx = {
        tuple(r) for r in spark.read.parquet(idx).select("id").collect()
    }
    _run(spark, [_doc("B", MX, marker="other ")], 1, store, out, idx)
    assert _verdicts(spark, out) == before_v
    after_idx = {
        tuple(r) for r in spark.read.parquet(idx).select("id").collect()
    }
    assert after_idx == before_idx == {("A",), ("B",)}


def test_crash_during_staging_write(spark, tmp_path, store, monkeypatch):
    # earliest window: the staged fingerprint build dies mid-write;
    # nothing downstream exists yet and the replay overwrites staging
    out, idx = str(tmp_path / "verdicts"), str(tmp_path / "index")
    orig = DataFrameWriter.parquet

    def boom(self, path, *a, **kw):
        if "_staging" in path:
            raise RuntimeError("injected crash: staging torn")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)
    with pytest.raises(RuntimeError, match="staging torn"):
        _run(spark, [_doc("A", MX)], 0, store, out, idx)
    monkeypatch.undo()
    assert not os.path.isdir(os.path.join(out, "batch=000000"))
    _run(spark, [_doc("A", MX)], 0, store, out, idx)
    assert _verdicts(spark, out) == {"A": "unique"}
    assert {r["id"] for r in spark.read.parquet(idx).collect()} == {"A"}
