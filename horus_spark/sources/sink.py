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
  xxhash64(doc_id), staged ONCE as parquet physically partitioned by the
  chunk value (so each chunk job prunes to its own directory instead of
  re-scanning the full input), and each chunk writes ALL its tables into a
  private tmp directory that one atomic rename promotes to `chunk=NNNN`,
  then drops a `chunk_NNN.done` marker. A resumed run reuses the staging,
  skips completed chunks, and discards stale tmp directories — idempotent
  restart with exactly-once, never-partially-visible output, no read-side
  dedup needed.

At 10^12-document scale each chunk is an independent job over a hash slice
of the corpus; a driver loss costs at most one chunk of work.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def write_extracted(extracted: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """Write the output tables from an EXTRACTED_DOCUMENT frame.

    Scale shape: the pipeline runs ONCE, into the wide nested table
    `documents_full` (the reference's serialized Document graph, like its
    Cosmos JSON — full PostCode, nested arrays). The four relational views
    are then DERIVED by re-reading that parquet: each derived scan prunes
    to exactly the columns it needs (header read skips the array blobs on
    disk), so the fan-out costs column-pruned I/O instead of pinning the
    whole extracted frame in executor storage memory (an unbounded .cache()
    at 10^12 docs was the previous design's scale-killer)."""
    wide_dir = os.path.join(out_dir, "documents_full")
    extracted.write.mode(mode).parquet(wide_dir)
    full = extracted.sparkSession.read.parquet(wide_dir)
    # persist-time-only PostCode truncation inside _header_frame, exactly
    # like the reference (Horus.Functions/HorusSql.cs:235-241 trims to 10
    # chars at the SQL INSERT; the document graph keeps the full value,
    # like the reference's Cosmos persistence of the Document object)
    _header_frame(full).write.mode(mode).parquet(os.path.join(out_dir, "documents_out"))
    full.select(
        "doc_id", F.explode("line_items").alias("li")
    ).select("doc_id", "li.*").write.mode(mode).parquet(
        os.path.join(out_dir, "line_items")
    )
    full.select(
        "doc_id", F.posexplode("errors").alias("error_seq", "e")
    ).select("doc_id", "error_seq", "e.*").write.mode(mode).parquet(
        os.path.join(out_dir, "errors")
    )
    full.select("doc_id", "spans_out").write.mode(mode).parquet(
        os.path.join(out_dir, "spans_out")
    )


def write_documents_by_account(extracted: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """S8: alternative persistence partitioned by account — the analog of
    the reference's Cosmos engine with partition key '/Account'
    (reference Horus.Functions/Engines/Persistence/CosmosPersistenceEngine.cs:27-50).
    Header rows only (the Cosmos document is the serialized header graph);
    null accounts land in a sentinel partition rather than Hive's default."""
    (
        _header_frame(extracted)
        .withColumn("account_pk", F.coalesce(F.col("account"), F.lit("__UNKNOWN__")))
        .write.mode(mode)
        .partitionBy("account_pk")
        .parquet(os.path.join(out_dir, "documents_by_account"))
    )


def _header_frame(extracted: DataFrame) -> DataFrame:
    header_cols = [
        c for c in extracted.columns if c not in ("line_items", "errors", "spans_out")
    ]
    header = extracted.select(*header_cols)
    if "post_code" in header_cols:
        header = header.withColumn("post_code", F.substring("post_code", 1, 10))
    return header


def _upload_ids(vdir: str) -> list[int]:
    if not os.path.isdir(vdir):
        return []
    return sorted(
        int(d.split("_")[-1]) for d in os.listdir(vdir) if d.startswith("upload_")
    )


def write_documents_versioned(
    extracted: DataFrame, out_dir: str, batch_id: int | None = None
) -> None:
    """W1+S4 end-to-end: version-stamped, append-only header persistence —
    the reference's document-versioning semantics
    (Horus.Functions/HorusSql.cs:221-249; SQL Patch/Add document
    versioning.sql:4-26) on the engine's own sink output.

    Each upload batch lands in its own `upload_NNNNNN` subdirectory with
    rows stamped document_version = (max version persisted by EARLIER
    uploads for the file_name) + rank within the batch (shredding ts,
    doc_id) — the reference's "SELECT MAX(DocumentVersion)+1 ... WHERE
    FileName = @x" done once per batch as a join + window instead of once
    per document.

    `batch_id` (streaming foreachBatch id) makes replay IDEMPOTENT: a
    replayed batch recomputes its versions against strictly-earlier
    uploads only and OVERWRITES its own directory, so at-least-once
    delivery still yields exactly-once versions. Default (None) = next
    free upload index (sequential batch API).

    The reference then UPDATEs LatestVersionIndicator=0 on all prior
    rows. Rewriting history per upload is O(total history) per batch —
    the scale-killer at 10^12 docs — and the flag is a pure function of
    the version column, so the store stays APPEND-ONLY and the flag is
    derived at read time by read_documents_versioned (one window,
    computed on exactly the rows being read)."""
    vdir = os.path.join(out_dir, "documents_versioned")
    prior = _upload_ids(vdir)
    if batch_id is None:
        batch_id = (prior[-1] + 1) if prior else 0
    prior = [i for i in prior if i < batch_id]
    header = _header_frame(extracted)
    order_cols = [c for c in ("shredding_utc_datetime", "doc_id") if c in header.columns]
    spark = extracted.sparkSession
    if prior:
        base = (
            spark.read.parquet(*[os.path.join(vdir, f"upload_{i:06d}") for i in prior])
            .groupBy("file_name")
            .agg(F.max("document_version").alias("__base"))
        )
        header = header.join(base, "file_name", "left").withColumn(
            "__base", F.coalesce(F.col("__base"), F.lit(0))
        )
    else:
        header = header.withColumn("__base", F.lit(0))
    w = Window.partitionBy("file_name").orderBy(*order_cols)
    header = header.withColumn(
        "document_version", (F.col("__base") + F.row_number().over(w)).cast("int")
    ).drop("__base")
    header.write.mode("overwrite").parquet(
        os.path.join(vdir, f"upload_{batch_id:06d}")
    )


def read_documents_versioned(spark, out_dir: str) -> DataFrame:
    """Versioned header rows across all uploads + the derived latest flag
    (the reference's LatestVersionIndicator, materialized by UPDATE there,
    computed by a window here — see write_documents_versioned for why)."""
    v = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(out_dir, "documents_versioned")
    )
    wall = Window.partitionBy("file_name")
    return v.withColumn(
        "latest_version_indicator",
        F.col("document_version") == F.max("document_version").over(wall),
    )


# The reference selects its persistence engine by reflection config
# (IPersistenceEngine: SqlPersistenceEngine | CosmosPersistenceEngine,
# Engines/Persistence/*.cs). Ours is a sink-strategy registry.
PERSISTENCE_ENGINES = {
    "tables": write_extracted,           # SQL analog: normalized multi-table
    "by_account": write_documents_by_account,  # Cosmos analog
    "versioned": write_documents_versioned,    # SQL analog + versioning patch
}


def get_persistence_engine(name: str):
    try:
        return PERSISTENCE_ENGINES[name]
    except KeyError:
        raise ValueError(f"Specified Engine does not exist: {name!r}") from None


def _metrics_frame(extracted: DataFrame, run_id: str, chunk: int) -> DataFrame:
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(F.size("spans_out")).alias("n_spans"),
        F.sum(F.size("errors")).alias("n_errors"),
    ]
    if "time_to_shred_ms" in extracted.columns:
        # per-doc measured extraction latency (P15), rolled up per task
        # partition — the reference persists TimeToShred per document
        # (HorusProcessingEngine.cs:15-16); the partition rollup is what a
        # 1000-executor operator actually monitors
        aggs += [
            F.round(F.avg("time_to_shred_ms"), 3).alias("avg_shred_ms"),
            F.round(F.max("time_to_shred_ms"), 3).alias("max_shred_ms"),
        ]
    if "recognizer_status" in extracted.columns:
        aggs.append(
            F.sum((F.col("recognizer_status") != "succeeded").cast("int")).alias(
                "n_recognizer_failures"
            )
        )
    return (
        extracted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(*aggs)
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
    fail_before_promote: int | None = None,
) -> dict:
    """Checkpoint-resumable extraction over hash chunks of the corpus.

    Returns {"completed": [...], "skipped": [...]}. `fail_after_chunk`
    injects a crash after N newly-completed chunks; `fail_before_promote`
    crashes the Nth new chunk after its tables are written but BEFORE the
    atomic promote (for atomicity tests).

    Atomic chunk commit: all of a chunk's tables (4 views + _metrics +
    _lineage) are written into a private `_tmp_chunk_NNNN` directory —
    invisible to read_output's `chunk=*` glob — and promoted with ONE
    os.rename once complete (an Iceberg-style snapshot swap without the
    catalog; swap in `.writeTo(...).append()` under a real catalog). A
    crash at ANY point during the chunk's writes leaves the published
    output exactly at the previous chunk state; resume discards the stale
    tmp directory and redoes the chunk."""
    from horus_spark.pipeline import run_extraction

    run_id = run_id or dt.datetime.now(dt.timezone.utc).strftime("run%Y%m%d%H%M%S")
    ckpt_dir = os.path.join(out_dir, "_checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    completed, skipped = [], []
    spark = documents.sparkSession
    chunk_of_doc = F.pmod(F.xxhash64("doc_id"), F.lit(n_chunks)).cast("int")

    # Stage the corpus ONCE, physically partitioned by the chunk hash: each
    # chunk job then reads exactly its partition DIRECTORY (true
    # directory-level pruning). A filter on a computed hash column over the
    # raw input cannot prune parquet, so without staging every chunk was a
    # full input scan — n_chunks x read volume at 10^12 docs. Staging costs
    # one scan+write per input table, amortized across all chunks and kept
    # across resumes.
    staging = os.path.join(out_dir, "_staging")
    for name, df in (("documents", documents), ("ocr_words", ocr_words)):
        sdir = os.path.join(staging, name)
        if not os.path.exists(os.path.join(sdir, "_SUCCESS")):
            df.withColumn("__chunk", chunk_of_doc).write.mode(
                "overwrite"
            ).partitionBy("__chunk").parquet(sdir)
    docs_c = spark.read.parquet(os.path.join(staging, "documents"))
    words_c = spark.read.parquet(os.path.join(staging, "ocr_words"))

    n_done = 0
    for chunk in range(n_chunks):
        marker = os.path.join(ckpt_dir, f"chunk_{chunk:04d}.done")
        if os.path.exists(marker):
            skipped.append(chunk)
            continue
        t0 = time.perf_counter()
        # __chunk is a real partition column of the staged layout -> the
        # scan's PartitionFilters prune to one directory per chunk
        d = docs_c.filter(F.col("__chunk") == chunk).drop("__chunk")
        w = words_c.filter(F.col("__chunk") == chunk).drop("__chunk")
        extracted = run_extraction(d, w, run_id=run_id)
        chunk_dir = os.path.join(out_dir, f"chunk={chunk:04d}")
        tmp_dir = os.path.join(out_dir, f"_tmp_chunk_{chunk:04d}")
        for stale in (tmp_dir, chunk_dir):  # leftovers from a crashed run
            if os.path.exists(stale):
                shutil.rmtree(stale)
        write_extracted(extracted, tmp_dir, mode="overwrite")
        wall_ms = int((time.perf_counter() - t0) * 1000)
        # metrics/lineage derive from the written wide table (column-pruned
        # re-read) — nothing stays pinned in executor storage memory
        full = spark.read.parquet(os.path.join(tmp_dir, "documents_full"))
        _metrics_frame(full, run_id, chunk).withColumn(
            "wall_ms", F.lit(wall_ms)
        ).write.mode("overwrite").parquet(os.path.join(tmp_dir, "_metrics"))
        full.select(
            "doc_id",
            F.lit(run_id).alias("run_id"),
            F.lit(chunk).alias("chunk"),
            F.lit("extracted").alias("stage"),
            F.current_timestamp().alias("ts"),
        ).write.mode("overwrite").parquet(os.path.join(tmp_dir, "_lineage"))
        if fail_before_promote is not None and n_done + 1 >= fail_before_promote:
            raise RuntimeError(f"injected failure before promoting chunk {chunk}")
        os.rename(tmp_dir, chunk_dir)  # atomic publish of the whole chunk
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


_LINE_ITEM_COLS = [
    "line_no", "item_description", "line_quantity", "unit_price", "vat_code",
    "taxable_indicator", "net_amount", "calculated_line_quantity",
    "discount_percent",
]
_ERROR_COLS = ["code", "severity", "message"]


def load_documents(
    spark, out_dir: str, file_names: list[str] | None = None, chunked: bool = False
) -> DataFrame:
    """The reference's LoadDocument read-back
    (Horus.Functions/HorusSql.cs:312-407): reconstruct the FULL document
    graph — header plus ordered line_items[] and errors[] — from the
    persisted relational tables, returning only the LATEST shred per
    file_name (the reference scans `ORDER BY ShreddingUtcDateTime DESC`
    and takes the first row).

    Set-oriented where the reference is per-document: one call
    reassembles every requested file in three scans + two aggregations,
    instead of three queries per file. `chunked=True` reads the
    checkpointed `chunk=*` layout; default reads a write_extracted dir.
    Pass `file_names` to prune (predicate reaches the parquet scan)."""
    if chunked:
        rd = lambda t: read_output(spark, out_dir, t)  # noqa: E731
    else:
        rd = lambda t: spark.read.parquet(os.path.join(out_dir, t))  # noqa: E731
    docs = rd("documents_out")
    if file_names is not None:
        docs = docs.filter(F.col("file_name").isin(list(file_names)))
    order = [
        c for c in ("shredding_utc_datetime", "unique_run_identifier", "doc_id")
        if c in docs.columns
    ]
    w = Window.partitionBy("file_name").orderBy(*[F.desc(c) for c in order])
    docs = docs.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    # reassemble ordered child arrays: line_no / error_seq are the
    # persisted order keys, so sort_array over (key, struct) then strip
    li = rd("line_items").groupBy("doc_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("line_no").alias("k"),
                        F.struct(*_LINE_ITEM_COLS).alias("v"),
                    )
                )
            ),
            lambda s: s["v"],
        ).alias("line_items")
    )
    err = rd("errors").groupBy("doc_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("error_seq").alias("k"),
                        F.struct(*_ERROR_COLS).alias("v"),
                    )
                )
            ),
            lambda s: s["v"],
        ).alias("errors")
    )
    from horus_spark.operators.shred import ERRORS_TYPE, LINE_ITEM_TYPE

    return (
        docs.join(li, "doc_id", "left")
        .join(err, "doc_id", "left")
        .withColumn(
            "line_items", F.coalesce(F.col("line_items"), F.array().cast(LINE_ITEM_TYPE))
        )
        .withColumn("errors", F.coalesce(F.col("errors"), F.array().cast(ERRORS_TYPE)))
    )
