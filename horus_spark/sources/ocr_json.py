"""S6: Spark-side OCR JSON ingestion.

At scale the recognizer output arrives as raw JSON blobs in a column (the
reference stores the whole response on the job and parses it in the
shredder — reference Horus.Functions/Engines/Processing/
HorusProcessingEngine.cs:20-25 JObject.Parse, blob persisted at
DocumentProcessor.cs:290-301). The engine-side equivalent is a pure
`from_json` with an explicit schema (never schema inference — the
reference whitelists its shapes too) followed by posexplode into the
engine's ocr_words layout, all JVM-side: no Python touches the blob.

The schema mirrors Azure FR v2 `analyzeResult.readResults`
(golden samples: reference Horus.Generator/quickstart/*.pdf.ocr.json);
fields we don't consume (selectionMarks, pageResults, documentResults)
are simply absent from the schema, which is how from_json prunes the
parse — column pruning for JSON."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# explicit parse schema: only what the layout engine consumes
OCR_JSON_SCHEMA = (
    "struct<analyzeResult: struct<readResults: array<struct<"
    "page: int, angle: double, width: double, height: double, unit: string,"
    "lines: array<struct<"
    "  text: string, boundingBox: array<double>,"
    "  words: array<struct<text: string, boundingBox: array<double>, confidence: double>>"
    ">>"
    ">>>>"
)


def ocr_words_from_json(
    blobs: DataFrame, json_col: str = "ocr_json", doc_id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, ocr_json string) -> ocr_words rows
    (doc_id, page, line_id, word_id, text, bbox array<float>, confidence).

    line_id/word_id are the positional indexes within the page/line —
    exactly the `#/readResults/p/lines/l/words/w` pointer coordinates the
    reference's table cells use (quickstart/*.ocr.json elements)."""
    parsed = blobs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.from_json(F.col(json_col), OCR_JSON_SCHEMA).alias("j"),
    )
    pages = parsed.select(
        "doc_id",
        F.explode(F.col("j.analyzeResult.readResults")).alias("pg"),
    )
    lines = pages.select(
        "doc_id",
        F.col("pg.page").alias("page"),
        F.posexplode(F.col("pg.lines")).alias("line_id", "ln"),
    )
    words = lines.select(
        "doc_id",
        "page",
        F.col("line_id").cast("int").alias("line_id"),
        F.posexplode(F.col("ln.words")).alias("word_id", "w"),
    )
    return words.select(
        "doc_id",
        "page",
        "line_id",
        F.col("word_id").cast("int").alias("word_id"),
        F.col("w.text").alias("text"),
        F.col("w.boundingBox").cast("array<float>").alias("bbox"),
        F.col("w.confidence").cast("float").alias("confidence"),
    )


def ocr_parse_errors(
    blobs: DataFrame, json_col: str = "ocr_json", doc_id_col: str = "doc_id"
) -> DataFrame:
    """The error channel for the ingestion path: (doc_id, error) for
    every blob that parses to nothing — from_json yields NULL for
    malformed JSON and NULL readResults for schema-mismatched JSON, and
    in both cases `ocr_words_from_json`'s explode drops the document
    with zero rows and zero diagnostics (review finding). Run this
    alongside the parse (same scan, one pass each) and route the rows
    to the errors sink like any PRE-code failure; a corrupted upload is
    then traceable instead of masquerading as an empty document."""
    parsed = blobs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col(json_col).isNull().alias("_null_blob"),
        F.from_json(F.col(json_col), OCR_JSON_SCHEMA).alias("j"),
    )
    # PERMISSIVE from_json yields a null-FIELDED struct (not NULL) for
    # malformed JSON, so malformed and schema-mismatched blobs are not
    # distinguishable here without a corrupt-record column — one label
    # covers both; the blob itself is in the source row for triage.
    return parsed.filter(
        F.col("_null_blob")
        | F.col("j").isNull()
        | F.col("j.analyzeResult.readResults").isNull()
    ).select(
        "doc_id",
        F.when(F.col("_null_blob"), F.lit("OCR_BLOB_NULL"))
        .otherwise(F.lit("OCR_JSON_UNPARSEABLE"))
        .alias("error"),
    )
