"""load_documents: the reference's LoadDocument read-back
(HorusSql.cs:312-407) — full document graph reconstructed from the
relational sink tables, latest shred per file_name."""

import time

import pyspark.sql.functions as F
import pytest

from horus_spark.fixtures.generator import corpus_spark
from horus_spark.pipeline import run_extraction
from horus_spark.sources.sink import load_documents, write_extracted


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sinkout"))
    c = corpus_spark(spark, 15, partitions=2)
    docs, words = c["documents"].cache(), c["ocr_words"].cache()
    extracted = run_extraction(docs, words, run_id="r1").cache()
    extracted.count()
    write_extracted(extracted, out)
    return out, extracted, docs, words


def test_round_trip_equals_original(spark, written):
    out, extracted, _, _ = written
    loaded = load_documents(spark, out)
    assert loaded.count() == extracted.count()
    orig = extracted.select(
        "doc_id",
        F.col("document_number").alias("e_num"),
        F.round("grand_total", 2).alias("e_grand"),
        F.substring("post_code", 1, 10).alias("e_pc"),  # persist truncation
        F.col("line_items").alias("e_li"),
        F.col("errors").alias("e_err"),
    )
    j = loaded.join(orig, "doc_id")
    bad = j.filter(
        (F.col("document_number") != F.col("e_num"))
        | (F.round("grand_total", 2) != F.col("e_grand"))
        | (F.col("post_code") != F.col("e_pc"))
        # full graph: ordered arrays reconstructed exactly
        | (F.col("line_items") != F.col("e_li"))
        | (F.col("errors") != F.col("e_err"))
    )
    assert bad.count() == 0


def test_latest_shred_wins_and_pruning(spark, written):
    out, extracted, docs, words = written
    time.sleep(1.1)  # distinct shredding_utc_datetime for the re-shred
    write_extracted(run_extraction(docs, words, run_id="r2"), out, mode="append")
    loaded = load_documents(spark, out)
    # still ONE row per file (the latest), not two
    assert loaded.count() == extracted.count()
    assert loaded.filter(F.col("unique_run_identifier") != "r2").count() == 0
    # children of the superseded r1 shred must NOT leak into the arrays:
    # both shreds share doc_id, so reassembly keyed on doc_id alone would
    # double every line_items/errors array (reference LoadDocument reads
    # children of the latest row only)
    orig = extracted.select(
        "doc_id",
        F.size("line_items").alias("e_nli"),
        F.size("errors").alias("e_nerr"),
    )
    doubled = loaded.join(orig, "doc_id").filter(
        (F.size("line_items") != F.col("e_nli"))
        | (F.size("errors") != F.col("e_nerr"))
    )
    assert doubled.count() == 0
    one = docs.limit(1).collect()[0].doc_id
    sub = load_documents(spark, out, file_names=[one])
    assert sub.count() == 1 and sub.collect()[0].doc_id == one
