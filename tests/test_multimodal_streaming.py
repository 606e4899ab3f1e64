"""Multimodal plumbing (stubbed decode) + incremental streaming extraction."""

import os

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    media_stats,
)


@pytest.fixture()
def media(spark):
    rows = [
        ("a1", "d1", "image", b"\x89PNGfake1", (640, 480, None, "png")),
        ("a2", "d1", "image", b"\x89PNGfake2", (800, 600, None, "png")),
        ("a3", "d2", "video", b"\x00\x00ftypfake", (1280, 720, 3500, "h264")),
        ("a4", "d3", "audio", b"RIFFfake", (None, None, 61000, "pcm")),
    ]
    return spark.createDataFrame(
        rows,
        "asset_id string, doc_id string, media_type string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int,codec:string>",
    )


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_feature_extraction_deterministic(spark, media):
    f1 = extract_features(media, fake=True).orderBy("asset_id").collect()
    f2 = extract_features(media, fake=True).orderBy("asset_id").collect()
    assert f1 == f2
    assert all(len(r.features) == 8 for r in f1)
    assert f1[0].features != f1[1].features  # payload-dependent


def test_frame_sample_plan(spark, media):
    frames = frame_sample(media, every_ms=1000).collect()
    assert len(frames) == 3  # 3500ms -> frames at 0,1000,2000 (ceil-free int)
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000]


def test_media_stats_prunes_payload(spark, media, tmp_path):
    """The default media_stats must not read payload bytes: on a
    parquet-backed frame the scan's ReadSchema excludes 'payload'
    (column pruning is the point of the metadata-only default — the
    100 TB catalog query does no blob I/O)."""
    df = media_stats(media)
    assert df.count() == 3
    loc = str(tmp_path / "media_pq")
    media.write.parquet(loc)
    pq = spark.read.parquet(loc)
    pruned = media_stats(pq)
    txt = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    read_schemas = [ln for ln in txt.splitlines() if "ReadSchema" in ln]
    assert read_schemas and all("payload" not in ln for ln in read_schemas)
    # the opt-in variant DOES read payload (and says so in its plan)
    full = media_stats(pq, include_payload_bytes=True)
    assert "total_bytes" in full.columns
    txt2 = full._sc._jvm.PythonSQLUtils.explainString(
        full._jdf.queryExecution(), "formatted"
    )
    assert any("payload" in ln for ln in txt2.splitlines() if "ReadSchema" in ln)
    got = {r.media_type: r.total_bytes for r in full.collect()}
    assert got["image"] == len(b"\x89PNGfake1") + len(b"\x89PNGfake2")


def test_streaming_available_now(spark, tmp_path):
    from horus_spark.fixtures.generator import corpus_spark
    from horus_spark.sources.sink import read_output
    from horus_spark.streaming.incremental import stream_extraction

    c = corpus_spark(spark, 20, partitions=2)
    docs_dir = str(tmp_path / "docs_in")
    c["documents"].write.parquet(docs_dir)
    words = c["ocr_words"].cache()
    words.count()
    out = str(tmp_path / "out")
    q = stream_extraction(
        spark, docs_dir, words, out, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(300)
    got = spark.read.parquet(os.path.join(out, "batch=*", "documents_out"))
    assert got.select("doc_id").distinct().count() == 20

    # incremental catch-up: 10 more docs arrive; only they are processed
    from horus_spark.fixtures.generator import corpus_spark as cs2

    more = cs2(spark, 10, base=31000, partitions=1)
    more["documents"].write.mode("append").parquet(docs_dir)
    words2 = more["ocr_words"].unionByName(words)
    q2 = stream_extraction(
        spark, docs_dir, words2, out, str(tmp_path / "ckpt"), available_now=True
    )
    q2.awaitTermination(300)
    got2 = spark.read.parquet(os.path.join(out, "batch=*", "documents_out"))
    assert got2.select("doc_id").distinct().count() == 30


def test_windowed_event_metrics_batch_semantics(spark):
    # validate the aggregation shape on a static frame (streaming semantics
    # exercised separately; watermark is a no-op in batch)
    from horus_spark.streaming.incremental import windowed_event_metrics

    e = spark.createDataFrame(
        [
            ("2026-01-01 00:01:00", "click", 1.0),
            ("2026-01-01 00:02:00", "click", 2.0),
            ("2026-01-01 00:07:00", "view", 5.0),
        ],
        "ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    out = windowed_event_metrics(e).collect()
    assert {(r.event_type, r.n_events) for r in out} == {("click", 2), ("view", 1)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    # duplicates arriving in LATER micro-batches within the watermark
    # horizon are dropped; state stays bounded (watermark eviction).
    import datetime

    from horus_spark.streaming.incremental import stream_dedup

    in_dir = str(tmp_path / "dedup_in")
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def batch(rows, name):
        spark.createDataFrame(
            [(k, t0 + datetime.timedelta(seconds=s)) for k, s in rows],
            "doc_key string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(in_dir)

    batch([("a", 0), ("b", 1), ("a", 2)], "b0")  # dup within one batch
    batch([("b", 3), ("c", 4)], "b1")  # cross-batch dup of b

    stream = spark.readStream.schema("doc_key string, ts timestamp").option(
        "maxFilesPerTrigger", "1"
    ).parquet(in_dir)
    deduped = stream_dedup(stream, ["doc_key"], ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select doc_key from dedup_sink").collect()
    keys = sorted(r["doc_key"] for r in got)
    assert keys == ["a", "b", "c"]


def test_stream_multimodal_ingest_cross_batch(spark, tmp_path):
    """Cross-batch multimodal dedup via the rolling persisted index: a
    renamed-asset clone and a one-image-swapped near twin arriving in a
    LATER batch are both caught against batch 1's index; uniques extend
    the index."""
    from horus_spark.streaming.incremental import (
        SPANS_SCHEMA,
        stream_multimodal_ingest,
    )

    texts = [f"stream chunk number {i} words" for i in range(14)]

    def doc(did, media_refs, marker=""):
        spans, off = [], 0
        for i, t in enumerate(texts):
            spans.append(("text", marker + t, "", off)); off += 1
            if i < len(media_refs):
                spans.append(("image", "", media_refs[i], off)); off += 1
        return (did, spans)

    media = spark.createDataFrame(
        [("m%d" % i, "p%d" % i) for i in range(6)]
        + [("r%d" % i, "p%d" % i) for i in range(6)]
        + [("mq", "DIFFERENT")],
        "asset_id string, payload string",
    )
    mx = ["m0", "m1", "m2", "m3", "m4", "m5"]
    spans_dir = str(tmp_path / "spans_in")
    out = str(tmp_path / "verdicts")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [doc("X", mx), doc("Y", mx, marker="other ")], SPANS_SCHEMA
    )
    batch1.coalesce(1).write.mode("append").parquet(spans_dir)
    q = stream_multimodal_ingest(spark, spans_dir, media, out, ckpt, idx)
    q.awaitTermination(300)

    got1 = {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(os.path.join(out, "batch=*")).collect()
    }
    assert got1 == {"X": "unique", "Y": "unique"}

    # batch 2: renamed-asset clone of X, near twin of Y, fresh doc Z
    batch2 = spark.createDataFrame(
        [
            doc("X2", ["r0", "r1", "r2", "r3", "r4", "r5"]),
            doc("Y2", ["m0", "m1", "m2", "m3", "m4", "mq"], marker="other "),
            doc("Z", mx, marker="fresh "),
        ],
        SPANS_SCHEMA,
    )
    batch2.coalesce(1).write.mode("append").parquet(spans_dir)
    q2 = stream_multimodal_ingest(spark, spans_dir, media, out, ckpt, idx)
    q2.awaitTermination(300)

    got = {
        r["doc_id"]: (r["verdict"], r["partner_id"])
        for r in spark.read.parquet(os.path.join(out, "batch=*")).collect()
    }
    assert got["X2"] == ("exact_existing", "X")
    assert got["Y2"] == ("near_existing", "Y")
    assert got["Z"] == ("unique", None)
    index_ids = {
        r["id"] for r in spark.read.parquet(idx).select("id").collect()
    }
    assert index_ids == {"X", "Y", "Z"}  # duplicates never enter


def test_stream_multimodal_ingest_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch must NOT see its own previous index slice
    (every doc would self-match as exact_existing and the overwrite
    would erase the slice): replay with a fresh checkpoint reproduces
    the same verdicts and leaves the index intact. The asset store is
    passed as a PATH (re-read per batch — the growing-store form)."""
    from horus_spark.streaming.incremental import (
        SPANS_SCHEMA,
        stream_multimodal_ingest,
    )

    texts = [f"replay chunk number {i} words" for i in range(14)]
    spans = []
    off = 0
    for i, t in enumerate(texts):
        spans.append(("text", t, "", off)); off += 1
        if i < 3:
            spans.append(("image", "", f"m{i}", off)); off += 1
    docs = spark.createDataFrame([("R", spans)], SPANS_SCHEMA)
    media_dir = str(tmp_path / "media")
    spark.createDataFrame(
        [("m0", "p0"), ("m1", "p1"), ("m2", "p2")],
        "asset_id string, payload string",
    ).write.parquet(media_dir)

    spans_dir = str(tmp_path / "in")
    out = str(tmp_path / "verdicts")
    idx = str(tmp_path / "index")
    docs.coalesce(1).write.mode("append").parquet(spans_dir)

    q = stream_multimodal_ingest(
        spark, spans_dir, media_dir, out, str(tmp_path / "ckpt1"), idx
    )
    q.awaitTermination(300)
    first = {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(os.path.join(out, "batch=*")).collect()
    }
    assert first == {"R": "unique"}

    # fresh checkpoint = Spark reprocesses the same files as batch 0
    # again — the crash-before-checkpoint-commit replay shape
    q2 = stream_multimodal_ingest(
        spark, spans_dir, media_dir, out, str(tmp_path / "ckpt2"), idx
    )
    q2.awaitTermination(300)
    replay = {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(os.path.join(out, "batch=*")).collect()
    }
    assert replay == {"R": "unique"}      # NOT exact_existing-vs-itself
    idx_ids = {
        r["id"]
        for r in spark.read.parquet(os.path.join(idx, "batch=*")).collect()
    }
    assert idx_ids == {"R"}               # slice intact, not erased


def test_stream_html_ingest_cross_batch(spark, tmp_path):
    """The crawl front: raw (doc_id, html) micro-batches -> DOM
    extraction -> spans -> the rolling index. A renamed-asset re-crawl
    in a later batch is caught exact against batch 1's index; nav
    boilerplate (incl. the logo img) never reaches the spans/index."""
    from horus_spark.streaming.incremental import stream_html_ingest

    texts = [f"crawl chunk number {i} words here" for i in range(10)]

    def page(refs, marker=""):
        body = "".join(
            f"<p>{marker}{t}</p>"
            + (f'<img src="{refs[i]}"/>' if i < len(refs) else "")
            for i, t in enumerate(texts)
        )
        return (
            '<html><body><div id="nav"><img src="LOGO.png"/><ul>'
            '<li><a href="/">Home</a></li><li><a href="/a">About</a></li>'
            f'</ul></div><div id="art">{body}</div></body></html>'
        )

    media = spark.createDataFrame(
        [("m%d" % i, "p%d" % i) for i in range(4)]
        + [("r%d" % i, "p%d" % i) for i in range(4)],
        "asset_id string, payload string",
    )
    pages_dir = str(tmp_path / "pages_in")
    out = str(tmp_path / "verdicts")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [("X", page(["m0", "m1", "m2", "m3"]))],
        "doc_id string, html string",
    )
    b1.coalesce(1).write.mode("append").parquet(pages_dir)
    q = stream_html_ingest(spark, pages_dir, media, out, ckpt, idx)
    q.awaitTermination(300)

    b2 = spark.createDataFrame(
        [
            ("X2", page(["r0", "r1", "r2", "r3"])),  # renamed re-crawl
            ("Z", page(["m0", "m1", "m2", "m3"], marker="fresh ")),
        ],
        "doc_id string, html string",
    )
    b2.coalesce(1).write.mode("append").parquet(pages_dir)
    q2 = stream_html_ingest(spark, pages_dir, media, out, ckpt, idx)
    q2.awaitTermination(300)

    got = {
        r["doc_id"]: (r["verdict"], r["partner_id"])
        for r in spark.read.parquet(os.path.join(out, "batch=*")).collect()
    }
    assert got["X"] == ("unique", None)
    assert got["X2"] == ("exact_existing", "X")
    assert got["Z"] == ("unique", None)
    index_ids = {
        r["id"] for r in spark.read.parquet(idx).select("id").collect()
    }
    assert index_ids == {"X", "Z"}
    # boilerplate media never entered the span stream: no dangling LOGO
    # fingerprint anywhere in the index slices
    idx_rows = spark.read.parquet(idx).collect()
    assert not any("LOGO" in str(r) for r in idx_rows)
