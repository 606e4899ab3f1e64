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

from pyspark.sql import DataFrame, Window
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


def duplicate_span_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Sliding-window exact-substring duplication coverage (the token-
    granular sibling of `duplicate_paragraph_stats`; Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — their suffix-array ExactSubstr criterion
    approximated at fixed window length, the standard scalable variant).

    Every length-`window` token window (stride 1) is hashed; a window is
    DUPLICATED if its text occurs in at least one other document; a
    doc's coverage is the union of its duplicated windows' intervals
    [pos, pos+window) — overlapping hits merge, so coverage counts
    tokens, not hits. Returns (id_col, n_tokens, n_windows,
    n_dup_windows, covered_tokens, dup_frac) for every input doc.

    Shape at scale: window construction is a map-side projection
    (transform over sequence + slice, codegen; the explode fans out
    n_tokens rows/doc but only (id, pos, digest) ever leave the map
    side); the corpus-scale aggregation moves 16-byte digests; the
    interval union is one per-doc sort window over int positions.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"), toks.alias("toks"), F.size(toks).alias("n_tokens")
    )
    k = int(window)
    wins = base.filter(F.col("n_tokens") >= k).select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, n_tokens - {k}), "
                f"i -> struct(i AS pos, md5(array_join(slice(toks, i + 1, {k}), ' ')) AS digest))"
            )
        ).alias("w"),
    ).select("id", F.col("w.pos").alias("pos"), F.col("w.digest").alias("digest"))

    dup_digests = (
        wins.select("digest", "id")
        .distinct()
        .groupBy("digest")
        .agg(F.count("*").alias("n_docs_with"))
        .filter(F.col("n_docs_with") > 1)
        .select("digest")
    )
    hits = wins.join(dup_digests, "digest").select("id", "pos")
    # union of equal-length intervals: sorted by pos, each hit covers
    # min(window, gap to the next hit); the last hit covers the full window
    nxt = F.lead("pos").over(Window.partitionBy("id").orderBy("pos"))
    covered = (
        hits.withColumn(
            "cv", F.least(F.lit(k), F.coalesce(nxt - F.col("pos"), F.lit(k)))
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_dup_windows"),
            F.sum("cv").alias("covered_tokens"),
        )
    )
    per_doc = base.select("id", "n_tokens").join(covered, "id", "left")
    out_base = docs.select(F.col(id_col).alias("id"))
    return out_base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.greatest(
            F.lit(0), F.coalesce("n_tokens", F.lit(0)) - F.lit(k) + 1
        ).cast("long").alias("n_windows"),
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
        F.round(
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.coalesce("covered_tokens", F.lit(0)) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )
