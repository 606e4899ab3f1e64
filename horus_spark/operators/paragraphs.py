"""Cross-document duplicated-passage statistics (CCNet / RefinedWeb
style): chunk every document into disjoint token windows, hash each
chunk, and measure how much of each document is text that also appears
in OTHER documents — the signal behind paragraph-level dedup, which
catches boilerplate that document-level dedup misses (shared headers,
license blocks, templated passages inside otherwise-unique docs).

Composition of existing operators: `chunking.chunk_documents` with
stride == window (disjoint windows, zero-shuffle projection) -> md5
chunk digests -> ONE hash aggregation per digest whose shuffle carries
(digest, distinct-doc count) after map-side partial aggregation — the
chunk TEXT never crosses the exchange (digests only) -> broadcast-free
join back on digest -> per-doc rollup. At 100 TB the digest
aggregation is the only corpus-scale shuffle and it moves 16-byte keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.chunking import chunk_documents


def duplicate_paragraph_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
) -> DataFrame:
    """Per doc: total chunks, chunks whose text also occurs in at least
    one OTHER document, and the duplicated fraction. Returns
    (id_col, n_chunks, n_dup_chunks, dup_frac). Docs too short to chunk
    (empty text) keep a row with zeros via the left join back."""
    chunks = chunk_documents(docs, id_col, text_col, window=window, stride=window)
    hashed = chunks.select(
        F.col(id_col).alias("id"), F.md5("chunk_text").alias("digest")
    )
    # digest -> number of DISTINCT docs containing it; shuffle carries
    # (digest, partial distinct state), never chunk text
    doc_counts = hashed.distinct().groupBy("digest").agg(
        F.count("*").alias("n_docs_with")
    )
    per_doc = (
        hashed.join(doc_counts, "digest")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("n_docs_with") > 1).cast("long")).alias("n_dup_chunks"),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
        F.round(
            F.when(
                F.coalesce("n_chunks", F.lit(0)) > 0,
                F.coalesce("n_dup_chunks", F.lit(0)) / F.col("n_chunks"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )
