"""Training-window chunking: split documents into fixed-size,
optionally overlapping token windows — the step between cleaned
documents and `packing.pack_sequences` in a training-data pipeline
(long docs must be windowed before sequences can be packed to a
context-length budget).

Shape at scale: the whole operator is a single map-side projection —
split, sequence, transform, slice, explode — ZERO shuffles, zero
Python. A 100 TB corpus chunks at scan speed and inherits the scan's
partitioning; pair with `sampling.cap_per_key` or `packing` downstream.
Explosion factor is bounded by ~len/stride per doc; very long documents
fatten their partition by that factor, which is exactly the skew the
extraction pipeline's MAX_DOC_WORDS cap and `skew.salted_join` exist
for — chunking itself stays embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """One row per (doc, window): (id_col, chunk_id, n_tokens,
    chunk_text). Windows start every `stride` tokens; the final window
    may be shorter than `window`; stride < window gives overlap.
    Empty/whitespace-only documents produce no rows. Token = whitespace
    split (the package's token_count convention)."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.least(F.lit(window), n - s).cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.slice(toks, s + 1, window)).alias("chunk_text"),
        ),
    )
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.n_tokens").alias("n_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )
