"""Content-defined chunking (CDC) — shift-resistant passage dedup.
The storage-dedup classic (LBFS's Rabin chunking, restic/borg, and
recently long-document near-dedup): cut each document into chunks at
positions where a rolling content hash satisfies `hash % divisor == 0`.
Because cut points depend only on LOCAL content (the k-gram ending at
the cut), inserting or deleting a sentence re-chunks only the region
around the edit — every chunk after it re-synchronizes and keeps its
digest, so shared passages dedup across documents EVEN WHEN offsets
shifted. Fixed-width chunking (q53) provably loses this: one inserted
token shifts every downstream window.

Relation to neighbors: q56 catches exact duplicated paragraphs (needs
identical paragraph boundaries), q61 measures duplicate-span coverage
against a known set, q86 winnowing selects fingerprints for OVERLAP
DETECTION (guaranteed-coverage sampling, no segmentation). CDC is the
segmentation tier: it materializes the shared passages themselves —
what you delete, not just what you detect.

Expected chunk length is `divisor` tokens (boundary probability 1/
divisor per position, geometric); k controls how much context defines
a cut (larger k = more distinctive boundaries, slower resync after an
edit).

Shape at scale: chunking is pure map-side array expressions — the
boundary-position array is built by one filter over gram hashes and
chunks by one zip_with over (starts, ends); NO quadratic per-token
cumulative scan and no per-doc window shuffle. Dedup stats shuffle only
(digest, id, n_tokens) triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.decontam import _norm_text
from horus_spark.operators.sampling import _HASH_HEX


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    divisor: int = 16,
    normalize: bool = True,
) -> DataFrame:
    """Chunk each document at content-defined boundaries: a cut falls
    AFTER token i when md5 of the k-gram ending at i (joined with
    single spaces) taken mod `divisor` is 0 (the package's 60-bit md5
    hash — engine-portable, so the oracle replays every boundary).
    Documents shorter than k tokens form one chunk. Returns exploded
    (id, chunk_idx:int, n_tokens:int, digest:string md5-of-chunk-text);
    empty/blank documents emit no rows."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if divisor < 2:
        raise ValueError(f"need divisor >= 2, got {divisor}")
    text = _norm_text(F.col(text_col)) if normalize else F.trim(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"), F.split(text, " ").alias("_toks")
    ).filter(F.length(F.array_join("_toks", "")) > 0)
    n = F.size("_toks")
    gram_hash = lambda i: F.conv(  # noqa: E731 — the winnow gram hash
        F.substring(
            F.md5(F.array_join(F.slice("_toks", i - k + 2, k), " ")),
            1,
            _HASH_HEX,
        ),
        16,
        10,
    ).cast("long")
    # boundary positions: 0-based token indexes i (>= k-1, < n-1 — a cut
    # after the last token would make an empty trailing chunk) where the
    # k-gram ending at i hashes to 0 mod divisor
    bpos = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i >= k - 1)
        & (i < n - 1)
        & (gram_hash(i) % divisor == 0),
    )
    starts = F.concat(F.array(F.lit(0)), F.transform(bpos, lambda p: p + 1))
    ends = F.concat(bpos, F.array(n - 1))
    chunks = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            (e - s + 1).cast("int").alias("n_tokens"),
            F.md5(
                F.array_join(F.slice("_toks", s + 1, e - s + 1), " ")
            ).alias("digest"),
        ),
    )
    return base.select("id", F.posexplode(chunks).alias("chunk_idx", "c")).select(
        "id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.digest").alias("digest"),
    )


def cdc_dup_stats(chunks: DataFrame) -> DataFrame:
    """Per-document duplication coverage from cdc_chunks output: a
    chunk is DUPLICATED when its digest occurs in more than one
    document (cross-doc sharing — within-doc repeats don't count).
    Returns (id, n_chunks:long, n_dup_chunks:long, n_tokens:long,
    dup_token_ppm:long — duplicated-chunk tokens as ppm of the doc's
    tokens, exact integer division). The digest side of the join
    carries (digest, n_docs) only — a corpus-scale but slim Exchange
    with map-side combine."""
    counts = chunks.groupBy("digest").agg(
        F.countDistinct("id").alias("_nd")
    )
    j = chunks.join(counts, "digest")
    return (
        j.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum((F.col("_nd") > 1).cast("long")).alias("n_dup_chunks"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("_nd") > 1, F.col("n_tokens")).otherwise(0)
            ).alias("_dup_toks"),
        )
        .select(
            "id",
            "n_chunks",
            F.col("n_dup_chunks").cast("long").alias("n_dup_chunks"),
            "n_tokens",
            F.expr(
                "CAST(_dup_toks * 1000000 div greatest(n_tokens, 1)"
                " AS BIGINT)"
            ).alias("dup_token_ppm"),
        )
    )
