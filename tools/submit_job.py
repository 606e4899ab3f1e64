"""Deployment smoke job for the north rule's `spark-submit --py-files`
packaging requirement: the engine must run from a zip of the package with
no repo checkout on the workers.

Run via tools/package_check.sh — from a scratch cwd so `horus_spark` is
importable ONLY through the --py-files zip. Generates a small corpus on
executors, runs the full extraction pipeline, writes the output tables,
and prints one JSON line."""

import json
import os
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> int:
    n_docs = int(os.environ.get("HORUS_SUBMIT_DOCS", "300"))
    spark = (
        SparkSession.builder.appName("horus_submit_check")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # imports AFTER the session exists: proves the zip on PYTHONPATH works
    # for the driver, and executor tasks resolve it via --py-files shipping
    from horus_spark.fixtures.generator import corpus_spark
    from horus_spark.pipeline import run_extraction
    from horus_spark.sources.sink import write_extracted

    c = corpus_spark(spark, n_docs, partitions=4)
    extracted = run_extraction(c["documents"], c["ocr_words"])
    out_dir = tempfile.mkdtemp(prefix="horus_submit_")
    write_extracted(extracted, out_dir)
    docs = spark.read.parquet(os.path.join(out_dir, "documents_out"))
    spans = spark.read.parquet(os.path.join(out_dir, "spans_out"))
    n_out, n_valid = docs.count(), docs.filter("is_valid").count()
    result = {
        "submitted_docs": n_docs,
        "extracted_docs": n_out,
        "valid_docs": n_valid,
        "span_rows": spans.count(),
        "ok": n_out == n_docs and n_valid == n_docs,
    }
    print("SUBMIT_RESULT " + json.dumps(result))
    spark.stop()
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
