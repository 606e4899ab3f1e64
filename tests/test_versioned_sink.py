"""W1+S4 end-to-end: document versioning stamped on the engine's own sink
output (reference faq.md §1; Horus.Functions/HorusSql.cs:221-249;
SQL Patch/Add document versioning.sql:4-26): re-uploading the same document
appends a new row with document_version+1 and flips the latest flag, with
identical content thumbprints across uploads."""

import pyspark.sql.functions as F

from horus_spark.fixtures.generator import corpus_spark
from horus_spark.pipeline import run_extraction
from horus_spark.sources.sink import (
    get_persistence_engine,
    read_documents_versioned,
    write_documents_versioned,
)


def test_duplicate_upload_two_versions(spark, tmp_path):
    out = str(tmp_path / "vout")
    c = corpus_spark(spark, 12, partitions=2)
    docs, words = c["documents"].cache(), c["ocr_words"].cache()
    n = docs.count()
    words.count()

    # upload 1
    write_documents_versioned(run_extraction(docs, words, run_id="r1"), out)
    v1 = read_documents_versioned(spark, out)
    assert v1.count() == n
    assert v1.filter(~F.col("latest_version_indicator")).count() == 0
    assert v1.filter(F.col("document_version") != 1).count() == 0

    # upload 2: the SAME documents again (duplicate upload)
    write_documents_versioned(run_extraction(docs, words, run_id="r2"), out)
    v2 = read_documents_versioned(spark, out).cache()
    try:
        assert v2.count() == 2 * n  # append-only: both versions retained
        per = v2.groupBy("file_name").agg(
            F.sort_array(F.collect_list("document_version")).alias("versions"),
            F.max(F.when(F.col("latest_version_indicator"), F.col("document_version"))).alias(
                "latest_v"
            ),
            F.sum(F.col("latest_version_indicator").cast("int")).alias("n_latest"),
            F.count_distinct("thumbprint").alias("n_thumbprints"),
            F.count_distinct("unique_run_identifier").alias("n_runs"),
        )
        bad = per.filter(
            (F.col("versions") != F.array(F.lit(1), F.lit(2)))
            | (F.col("latest_v") != 2)      # flag flipped to the re-upload
            | (F.col("n_latest") != 1)
            | (F.col("n_thumbprints") != 1)  # same content = same thumbprint
            | (F.col("n_runs") != 2)         # distinct run stamps
        )
        assert bad.count() == 0
    finally:
        v2.unpersist()

    # third upload of ONE document only -> its version 3, others stay at 2
    one = docs.limit(1)
    one_words = words.join(one.select("doc_id"), "doc_id", "left_semi")
    write_documents_versioned(run_extraction(one, one_words, run_id="r3"), out)
    v3 = read_documents_versioned(spark, out)
    assert v3.filter(F.col("document_version") == 3).count() == 1
    assert (
        v3.filter(F.col("latest_version_indicator") & (F.col("document_version") == 3)).count()
        == 1
    )
    assert v3.filter(F.col("latest_version_indicator")).count() == n


def test_versioned_engine_registered(spark):
    assert get_persistence_engine("versioned") is write_documents_versioned


def test_streaming_reupload_bumps_version(spark, tmp_path):
    """The reference's event-driven flow: a blob landing AGAIN triggers a
    new orchestration and the persist bumps DocumentVersion
    (JobMonitor.cs:28-49 + HorusSql.cs:221-233). Spark-native: the same
    document file dropped into the watched directory in a LATER
    micro-batch -> versioned sink appends version 2, latest flag flips."""
    import os

    from horus_spark.streaming.incremental import stream_extraction

    docs_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "vout")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(docs_dir)

    c = corpus_spark(spark, 6, partitions=2)
    docs, words = c["documents"].cache(), c["ocr_words"].cache()
    n = docs.count()
    words.count()

    # upload 1: all docs land
    docs.coalesce(1).write.mode("append").parquet(docs_dir)
    q = stream_extraction(spark, docs_dir, words, out, ckpt, sink="versioned")
    q.awaitTermination()
    v1 = read_documents_versioned(spark, out)
    assert v1.count() == n
    assert v1.filter(F.col("document_version") != 1).count() == 0

    # upload 2: ONE document's file lands again (new parquet file, same doc)
    docs.limit(1).coalesce(1).write.mode("append").parquet(docs_dir)
    q = stream_extraction(spark, docs_dir, words, out, ckpt, sink="versioned")
    q.awaitTermination()

    v2 = read_documents_versioned(spark, out)
    assert v2.count() == n + 1
    re_doc = v2.filter(F.col("document_version") == 2)
    assert re_doc.count() == 1
    assert re_doc.collect()[0].latest_version_indicator is True
    # the other docs keep version 1 as latest
    assert v2.filter(F.col("latest_version_indicator")).count() == n


def test_base_read_uses_compacted_manifest(spark, tmp_path):
    """After many uploads, the write path's base-version computation must
    read ONE compacted manifest snapshot, not every prior upload directory
    (O(n_uploads) scans per append was the r3-flagged metadata growth).
    Also: a store whose manifests are deleted falls back to the full scan
    and yields the same bases."""
    import os

    from horus_spark.sources.sink import _version_base_frame

    out = str(tmp_path / "vs")
    c = corpus_spark(spark, 6, partitions=2)
    ex = run_extraction(c["documents"], c["ocr_words"], run_id="m1")
    n_uploads = 12
    for _ in range(n_uploads):
        write_documents_versioned(ex, out)
    vdir = os.path.join(out, "documents_versioned")
    prior = list(range(n_uploads))
    base = _version_base_frame(spark, vdir, prior)
    files = base.inputFiles()
    # one coalesced manifest file — NOT n_uploads directories of parts
    assert len(files) == 1, files
    assert "_version_base" in files[0]
    got = {r["file_name"]: r["__base"] for r in base.collect()}
    assert set(got.values()) == {n_uploads}
    # fallback parity: remove manifests -> scan path, same bases
    import shutil

    shutil.rmtree(os.path.join(vdir, "_version_base"))
    scan = _version_base_frame(spark, vdir, prior)
    assert len(scan.inputFiles()) > 1
    assert {r["file_name"]: r["__base"] for r in scan.collect()} == got
    # and the next upload after manifest loss still versions correctly
    write_documents_versioned(ex, out)
    v = read_documents_versioned(spark, out)
    assert v.agg(F.max("document_version")).collect()[0][0] == n_uploads + 1
