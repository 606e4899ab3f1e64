"""Streaming feed ingestion (streaming/incremental.py:
stream_feed_ingest / _feed_batch): durable seen-set dedup across
micro-batches, canonical-URL veto, replay idempotence."""

import os

from horus_spark.streaming.incremental import _feed_batch, stream_feed_ingest


def _rss(*items):
    body = "".join(
        f"<item><title>{t}</title><link>{u}</link></item>" for t, u in items
    )
    return f'<rss version="2.0"><channel>{body}</channel></rss>'


def _slice_urls(spark, out_dir, bid):
    p = os.path.join(out_dir, f"batch={bid}")
    return sorted(r["url"] for r in spark.read.parquet(p).collect())


def test_cross_batch_seen_and_canonical_veto(spark, tmp_path):
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    b1 = spark.createDataFrame(
        [("f1", _rss(("A", "https://ex.com/a"), ("B", "https://ex.com/b")))],
        "src string, feed_xml string",
    )
    _feed_batch(spark, b1, 0, out, seen)
    assert _slice_urls(spark, out, 0) == [
        "https://ex.com/a",
        "https://ex.com/b",
    ]
    # batch 2: B re-announced, A re-announced behind a utm tag (the
    # canonical veto must catch it), C genuinely new
    b2 = spark.createDataFrame(
        [
            (
                "f1",
                _rss(
                    ("B again", "https://ex.com/b"),
                    ("A utm", "https://ex.com/a?utm_source=feed"),
                    ("C", "https://ex.com/c"),
                ),
            )
        ],
        "src string, feed_xml string",
    )
    _feed_batch(spark, b2, 1, out, seen)
    assert _slice_urls(spark, out, 1) == ["https://ex.com/c"]


def test_replay_is_idempotent(spark, tmp_path):
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    b1 = spark.createDataFrame(
        [("f1", _rss(("A", "https://ex.com/a")))],
        "src string, feed_xml string",
    )
    b2 = spark.createDataFrame(
        [("f1", _rss(("B", "https://ex.com/b")))],
        "src string, feed_xml string",
    )
    _feed_batch(spark, b1, 0, out, seen)
    _feed_batch(spark, b2, 1, out, seen)
    first = _slice_urls(spark, out, 1)
    # replay batch 1: its own seen slice must not veto it
    _feed_batch(spark, b2, 1, out, seen)
    assert _slice_urls(spark, out, 1) == first == ["https://ex.com/b"]


def test_within_batch_dedup_deterministic(spark, tmp_path):
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    b = spark.createDataFrame(
        [
            ("f2", _rss(("T2", "https://ex.com/x"))),
            ("f1", _rss(("T1", "https://ex.com/x"))),
        ],
        "src string, feed_xml string",
    )
    _feed_batch(spark, b, 0, out, seen)
    rows = spark.read.parquet(os.path.join(out, "batch=0")).collect()
    assert len(rows) == 1
    assert rows[0]["src"] == "f1"  # min-struct winner, not arrival order


def test_streaming_end_to_end(spark, tmp_path):
    feeds = str(tmp_path / "feeds")
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("f1", _rss(("A", "https://ex.com/a")))],
        "src string, feed_xml string",
    ).write.parquet(feeds)
    q = stream_feed_ingest(spark, feeds, out, seen, ckpt)
    q.awaitTermination(120)
    assert _slice_urls(spark, out, 0) == ["https://ex.com/a"]
