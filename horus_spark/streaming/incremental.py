"""Incremental (streaming) extraction.

The reference is event-driven per document: a blob lands, a queue message
triggers one orchestration (reference Horus.Functions/JobMonitor.cs:28-49).
The Spark-native equivalent is a Structured Streaming file source with
`trigger(availableNow=True)` catch-up semantics: new document files are
discovered, each micro-batch runs the SAME batch pipeline via foreachBatch,
and the checkpoint directory replaces the queue's at-least-once state.

OCR words ride as a static side (stream-static pattern): the per-batch
doc_id set prunes the static scan. Late/duplicate files are handled by the
sink's idempotent per-chunk overwrite (sources/sink.py).

Also here: watermarked windowed aggregation over an event stream — the
streaming-analog of the reference's 5-minute scoring cadence
(Horus.Inspector/TimedInspector.cs:13).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horus_spark import schema as S


def stream_extraction(
    spark: SparkSession,
    documents_dir: str,
    ocr_words: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental extraction over a growing directory of document parquet
    files. Returns the started StreamingQuery."""
    from horus_spark.pipeline import run_extraction
    from horus_spark.sources.sink import write_extracted

    stream = spark.readStream.schema(S.DOCUMENTS).parquet(documents_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        # prune the static OCR side to this batch's documents (broadcast
        # semi-join on doc_id keeps the static scan proportional to the batch)
        batch_words = ocr_words.join(
            F.broadcast(batch_df.select("doc_id").distinct()), "doc_id", "left_semi"
        )
        extracted = run_extraction(batch_df, batch_words)
        write_extracted(
            extracted, os.path.join(out_dir, f"batch={batch_id:06d}"), mode="overwrite"
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_metrics(
    events_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a (ts, event_type,
    value) stream — late data beyond the watermark is dropped, state is
    bounded (the scale-safe default for 100 TB event streams)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
