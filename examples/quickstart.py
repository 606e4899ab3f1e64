"""Quickstart: the full horus_spark flow in one script.

Mirrors what a user of the reference engine does today — drop documents,
extract, persist with versioning, read back, dedup, search — expressed as
one PySpark session. Runs locally in ~1 minute:

    python examples/quickstart.py

Every step is the library API (see horus_spark/__init__.py for the full
surface); swap the parquet paths for your lake and `local[*]` for your
cluster master and the same script runs at fleet scale.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import horus_spark as h  # noqa: E402
from horus_spark.fixtures.generator import corpus_spark  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    spark = h.get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="horus_quickstart_")

    # 1. A corpus of interleaved text+media documents + their OCR words.
    #    (Here: the seeded synthetic corpus; in production: your staging
    #    tables, or sources/ocr_json.py for raw recognizer JSON blobs.)
    c = corpus_spark(spark, 200, partitions=8)
    documents, ocr_words = c["documents"], c["ocr_words"]

    # 2. Extract: layout -> fields -> shred -> span classification.
    extracted = h.run_extraction(documents, ocr_words, run_id="quickstart-1")
    extracted.select(
        "doc_id", "document_number", "grand_total", "is_valid",
        "recognizer_status", F.round("time_to_shred_ms", 2).alias("shred_ms"),
    ).show(5, truncate=False)

    # 3. Persist with document versioning; re-upload bumps the version.
    h.write_documents_versioned(extracted, out)
    h.write_documents_versioned(
        h.run_extraction(documents, ocr_words, run_id="quickstart-2"), out
    )
    versions = h.read_documents_versioned(spark, out)
    versions.groupBy("document_version").count().orderBy("document_version").show()

    # 4. Multi-table sink + full-graph read-back (latest shred per file).
    h.write_extracted(extracted, out)
    loaded = h.load_documents(spark, out)
    print("read back", loaded.count(), "documents with",
          loaded.agg(F.sum(F.size("line_items"))).collect()[0][0], "line items")

    # 5. Training-data ops over the span texts.
    text_docs = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat_ws(" ", F.transform(F.col("spans"), lambda s: s["text"])).alias("text"),
    )
    dd = h.dedup_pipeline(text_docs, threshold=0.5, log_collapsed=False)
    print("dedup: canonical docs =", dd["canonical_docs"].count(),
          "| fuzzy near-dup pairs =", dd["fuzzy_pairs"].count())

    spark.stop()
    print("quickstart OK")


if __name__ == "__main__":
    main()
