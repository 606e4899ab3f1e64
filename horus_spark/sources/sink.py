"""Output sinks + checkpoint-resumable runner.

The reference persists each document transactionally with versioning and
keeps replayable orchestration state (reference Horus.Functions/HorusSql.cs:210-311,
DocumentProcessor.cs:52-111 durable replay, job-state blobs at 351-362).
The Spark-native equivalent:

- output tables: documents_out, line_items (exploded), errors (exploded),
  spans_out — parquet directories (Iceberg-ready: swap `.parquet` for
  `.writeTo(...).append()` when a catalog is configured)
- _metrics: one row per task partition (doc/span/error counts, wall ms)
- _lineage: (run_id, chunk, doc_id, stage, ts)
- checkpoint-resume: the corpus is split into deterministic chunks by
  xxhash64(doc_id); each chunk writes to its own subdirectory and then
  drops a `chunk_NNN.done` marker. A resumed run skips completed chunks and
  OVERWRITES any partially-written chunk directory — idempotent restart
  with exactly-once output, no read-side dedup needed.

At 10^12-document scale each chunk is an independent job over a hash slice
of the corpus; a driver loss costs at most one chunk of work.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_extracted(extracted: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """Write the four output tables from an EXTRACTED_DOCUMENT frame."""
    header_cols = [
        c for c in extracted.columns if c not in ("line_items", "errors", "spans_out")
    ]
    extracted.cache()
    try:
        header = extracted.select(*header_cols)
        if "post_code" in header_cols:
            # persist-time-only truncation, exactly like the reference
            # (Horus.Functions/HorusSql.cs:235-241 trims PostCode to 10
            # chars at INSERT; the in-memory Document keeps the full value)
            header = header.withColumn("post_code", F.substring("post_code", 1, 10))
        header.write.mode(mode).parquet(
            os.path.join(out_dir, "documents_out")
        )
        extracted.select(
            "doc_id", F.explode("line_items").alias("li")
        ).select("doc_id", "li.*").write.mode(mode).parquet(
            os.path.join(out_dir, "line_items")
        )
        extracted.select(
            "doc_id", F.posexplode("errors").alias("error_seq", "e")
        ).select("doc_id", "error_seq", "e.*").write.mode(mode).parquet(
            os.path.join(out_dir, "errors")
        )
        extracted.select("doc_id", "spans_out").write.mode(mode).parquet(
            os.path.join(out_dir, "spans_out")
        )
    finally:
        extracted.unpersist()


def _metrics_frame(extracted: DataFrame, run_id: str, chunk: int) -> DataFrame:
    return (
        extracted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("spans_out")).alias("n_spans"),
            F.sum(F.size("errors")).alias("n_errors"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("chunk", F.lit(chunk))
    )


def run_checkpointed(
    documents: DataFrame,
    ocr_words: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    n_chunks: int = 8,
    fail_after_chunk: int | None = None,
) -> dict:
    """Checkpoint-resumable extraction over hash chunks of the corpus.

    Returns {"completed": [...], "skipped": [...]}. `fail_after_chunk`
    injects a crash after N newly-completed chunks (for resume tests)."""
    from horus_spark.pipeline import run_extraction

    run_id = run_id or dt.datetime.now(dt.timezone.utc).strftime("run%Y%m%d%H%M%S")
    ckpt_dir = os.path.join(out_dir, "_checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    completed, skipped = [], []
    chunk_of_doc = F.pmod(F.xxhash64("doc_id"), F.lit(n_chunks)).cast("int")
    docs_c = documents.withColumn("__chunk", chunk_of_doc)
    words_c = ocr_words.withColumn("__chunk", chunk_of_doc)

    n_done = 0
    for chunk in range(n_chunks):
        marker = os.path.join(ckpt_dir, f"chunk_{chunk:04d}.done")
        if os.path.exists(marker):
            skipped.append(chunk)
            continue
        t0 = time.perf_counter()
        # partition pruning on __chunk keeps each job a slice of the corpus
        d = docs_c.filter(F.col("__chunk") == chunk).drop("__chunk")
        w = words_c.filter(F.col("__chunk") == chunk).drop("__chunk")
        extracted = run_extraction(d, w).cache()
        chunk_dir = os.path.join(out_dir, f"chunk={chunk:04d}")
        write_extracted(extracted, chunk_dir, mode="overwrite")
        wall_ms = int((time.perf_counter() - t0) * 1000)
        _metrics_frame(extracted, run_id, chunk).withColumn(
            "wall_ms", F.lit(wall_ms)
        ).write.mode("overwrite").parquet(os.path.join(chunk_dir, "_metrics"))
        extracted.select(
            "doc_id",
            F.lit(run_id).alias("run_id"),
            F.lit(chunk).alias("chunk"),
            F.lit("extracted").alias("stage"),
            F.current_timestamp().alias("ts"),
        ).write.mode("overwrite").parquet(os.path.join(chunk_dir, "_lineage"))
        extracted.unpersist()
        # marker LAST: a crash before this point leaves the chunk incomplete
        # and the resume overwrites it
        with open(marker, "w") as fh:
            json.dump({"run_id": run_id, "chunk": chunk, "wall_ms": wall_ms}, fh)
        completed.append(chunk)
        n_done += 1
        if fail_after_chunk is not None and n_done >= fail_after_chunk:
            raise RuntimeError(f"injected failure after chunk {chunk}")
    return {"completed": completed, "skipped": skipped, "run_id": run_id}


def read_output(spark, out_dir: str, table: str) -> DataFrame:
    """Read a table across all completed chunk directories."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "chunk=*", table)
    )
