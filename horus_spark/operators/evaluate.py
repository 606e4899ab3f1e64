"""Extraction-quality evaluation: token-multiset precision / recall / F1
of a predicted text corpus against a gold one, per document.

Why an engine needs this: every boilerplate-strip / main-content
extractor is a precision-recall trade (the reference scores its
extraction the same way — Inspector.cs's per-document accuracy points;
web-extraction literature scores Readability/CETD variants by token- or
char-level F1 against cleaneval-style gold). This operator turns any
(doc_id, text) pair of frames into per-document integer-exact metrics,
so a cheap screen (html_blocks) can be audited against a precise tier
(dom_extract) or planted ground truth at any scale.

Semantics: whitespace tokens as a MULTISET (a token predicted twice but
gold once contributes one match), n_common = sum over tokens of
min(pred_count, gold_count). Ratios are integer per-mille (1000*x div
denominator) so results are bit-identical across engines/partitionings
— no float reductions anywhere.

Scale shape: both sides explode to (doc, token) and aggregate with
map-side combine — ONE shuffle carrying (doc, token, counts), then a
tiny per-doc rollup. Multiple rows per doc_id on either side are legal
(block-level predictions aggregate naturally). No UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_overlap_eval(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token-overlap metrics of `pred` vs `gold`.

    Returns (doc_id, n_pred, n_gold, n_common, precision_milli,
    recall_milli, f1_milli); zero-token sides yield 0 metrics. A doc
    present on either side gets a row."""

    def toks(df: DataFrame, side: int) -> DataFrame:
        t = F.col(text_col)
        arr = F.when(
            F.length(F.trim(t)) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(F.trim(t), r"\s+"))
        # explode_outer keeps empty/NULL-text docs visible (NULL token,
        # counted by neither side)
        return df.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.explode_outer(arr).alias("tok"),
            F.lit(side).alias("side"),
        )

    u = toks(pred, 1).unionByName(toks(gold, 2))
    cnt = u.groupBy("doc_id", "tok").agg(
        F.sum(
            F.when((F.col("side") == 1) & F.col("tok").isNotNull(), 1)
            .otherwise(0)
        ).alias("pc"),
        F.sum(
            F.when((F.col("side") == 2) & F.col("tok").isNotNull(), 1)
            .otherwise(0)
        ).alias("gc"),
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("pc").cast("long").alias("n_pred"),
        F.sum("gc").cast("long").alias("n_gold"),
        F.sum(F.least("pc", "gc")).cast("long").alias("n_common"),
    )
    return agg.select(
        "doc_id",
        "n_pred",
        "n_gold",
        "n_common",
        F.expr(
            "CASE WHEN n_pred = 0 THEN 0"
            " ELSE (1000 * n_common) div n_pred END"
        ).cast("int").alias("precision_milli"),
        F.expr(
            "CASE WHEN n_gold = 0 THEN 0"
            " ELSE (1000 * n_common) div n_gold END"
        ).cast("int").alias("recall_milli"),
        F.expr(
            "CASE WHEN n_pred + n_gold = 0 THEN 0"
            " ELSE (2000 * n_common) div (n_pred + n_gold) END"
        ).cast("int").alias("f1_milli"),
    )
