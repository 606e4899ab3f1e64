"""End-to-end extraction pipeline.

Collapses the reference's 10-activity orchestration
(reference Horus.Functions/DocumentProcessor.cs:52-111: copy/rename ->
recognize -> shred -> persist) into ONE Spark job with a single planned
shuffle per input table:

    ocr_words ── repartition(bucket(doc_id)) ── applyInPandas(layout+fields)
                                                     │ (doc_id, fields, field_line_ids)
    documents ───────────────── join(doc_id) ────────┤
                                                     ▼
                  shred (pure expressions) + classify spans (pure expressions)
                                                     ▼
        extracted(doc header, line_items[], errors[], spans_out[]) -> sinks

Skew control: documents are bucketed by xxhash64(doc_id) so media-heavy
documents spread uniformly; the per-batch UDF vectorizes L1 across all
documents in a bucket (reference's skew = 1..17 line items/doc,
Generator.cs:64).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.config import format_of_doc_id
from horus_spark.operators.boilerplate import is_boilerplate_text
from horus_spark.operators.fields import extract_fields, field_line_ids
from horus_spark.operators.layout import cluster_lines, fragments_view, infer_grid
from horus_spark.operators.shred import shred

FIELDS_SCHEMA = (
    "doc_id string, fields map<string,string>, field_line_ids array<int>"
)


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One bucket of OCR words (many docs) -> per-doc fields + field lines.
    L1 runs vectorized over the WHOLE batch; grid/fields per doc (bounded:
    <=250 words/doc)."""
    if len(pdf) == 0:
        return pd.DataFrame({"doc_id": [], "fields": [], "field_line_ids": []})
    clustered = cluster_lines(pdf)
    frags_all = fragments_view(clustered)
    out_ids, out_fields, out_lines = [], [], []
    for doc_id, frags in frags_all.groupby("doc_id", sort=False):
        frags = frags.sort_values("frag_ord").reset_index(drop=True)
        grid = infer_grid(frags)
        fields, used = extract_fields(frags, grid, format_of_doc_id(doc_id))
        out_ids.append(doc_id)
        out_fields.append(fields)
        out_lines.append(sorted(field_line_ids(frags, used)))
    return pd.DataFrame(
        {"doc_id": out_ids, "fields": out_fields, "field_line_ids": out_lines}
    )


def recognize(ocr_words: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """The native 'recognizer': OCR words -> (doc_id, fields, field_line_ids).

    Replaces the reference's external form-recognizer call
    (DocumentProcessor.cs:196-301) with local layout math. One shuffle
    (hash on doc_id into n_buckets groups)."""
    spark = ocr_words.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bucketed = ocr_words.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandas(
        lambda key, pdf: _extract_batch(pdf), schema=FIELDS_SCHEMA
    )


def classify_spans_expr() -> "F.Column":
    """L6: 3-way span classification as a pure Spark expression.

    media span -> 'form-field' iff its OCR line contributed a word to any
    extracted field value, else 'boilerplate' (form decoration);
    text span  -> 'boilerplate' per the L5 block scorer, else 'content'.
    Order (offset) is preserved — the north rule compares sequences."""
    return F.transform(
        F.col("spans"),
        lambda s: F.struct(
            F.when(
                s["kind"] == "media",
                F.when(
                    F.array_contains(
                        F.coalesce(F.col("field_line_ids"), F.array().cast("array<int>")),
                        F.regexp_extract(s["media_ref"], r"L(\d+)$", 1).cast("int"),
                    ),
                    F.lit("form-field"),
                ).otherwise(F.lit("boilerplate")),
            )
            .otherwise(
                F.when(is_boilerplate_text(s["text"]), F.lit("boilerplate")).otherwise(
                    F.lit("content")
                )
            )
            .alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )


def thumbprint_expr() -> "F.Column":
    """Content MD5 (dedup key) — the reference's blob thumbprint
    (DocumentProcessor.cs:212-224) computed over the span texts."""
    return F.md5(F.concat_ws("", F.transform(F.col("spans"), lambda s: s["text"])))


def run_extraction(
    documents: DataFrame,
    ocr_words: DataFrame,
    n_buckets: int | None = None,
) -> DataFrame:
    """Full pipeline -> EXTRACTED_DOCUMENT rows (header + line_items +
    errors + spans_out). Two planned shuffles total (one per input table),
    everything after the join is map-side whole-stage codegen."""
    fields_df = recognize(ocr_words, n_buckets)
    joined = (
        documents.join(fields_df, "doc_id", "left")
        .withColumn(
            "fields",
            F.coalesce(
                F.col("fields"),
                F.map_from_arrays(
                    F.array().cast("array<string>"), F.array().cast("array<string>")
                ),
            ),
        )
        .withColumn("thumbprint", thumbprint_expr())
        .withColumn("spans_out", classify_spans_expr())
    )
    return shred(joined, carry=["spans_out"])
