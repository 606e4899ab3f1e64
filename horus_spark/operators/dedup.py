"""Deduplication operators for web-scale corpora.

Four tiers, each a standard large-corpus technique:
- exact:    content-hash groupBy (the reference's MD5 thumbprint dedup,
            reference Horus.Functions/DocumentProcessor.cs:212-224 + faq.md)
- ngram-jaccard: word-shingle inverted index -> candidate pairs sharing a
            shingle -> exact Jaccard >= threshold (exactly SQL-expressible,
            used as the verification oracle for the sketch tiers)
- minhash-LSH: k xxhash64 permutations -> banded signatures -> bucket join
            -> candidates verified by exact Jaccard (the at-scale path:
            candidate generation is linear in corpus size, never all-pairs)
- simhash:  64-bit sign-aggregated token hashes + hamming threshold

Scale notes: shingle explode is the only wide stage; the inverted-index
join co-partitions on the shingle hash. Hot shingles are capped
(df > max_doc_freq pruned) — the standard stopword-shingle guard — which
bounds the worst key's fanout, i.e. built-in skew control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)])
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: every row keyed by its thumbprint with
    the canonical (minimum) id and the duplicate-group size."""
    h = df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("thumbprint"))
    groups = h.groupBy("thumbprint").agg(
        F.min("id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return h.join(groups, "thumbprint").select(
        "id", "thumbprint", "canonical_id", (F.col("id") != F.col("canonical_id")).alias("is_duplicate")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard, generated via a
    shingle inverted index (no all-pairs cross join). Returns
    (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6dp.

    Hot shingles (document frequency > max_doc_freq) are pruned from
    CANDIDATE GENERATION only — the stopword-shingle guard that bounds the
    worst key's join fanout (skew control). The intersection is then
    recomputed exactly over the FULL shingle sets of the surviving
    candidate pairs, so the reported jaccard is exact regardless of
    pruning (a pair is missed only if it shares exclusively hot shingles,
    which at threshold-level similarity cannot happen unless the whole
    document is stopwords)."""
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    # prune hot shingles (stopword-shingle guard == skew control)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    pruned = sh.join(freq.filter(F.col("df_") <= max_doc_freq), "shingle")
    pairs = (
        pruned.alias("a")
        .join(pruned.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter_pruned"))
    )
    # cheap exact lower bound first: a pair can only reach the threshold if
    # inter >= t/(1+t) * (na+nb); inter_pruned + (what pruning can add) caps
    # nothing, so verify every candidate pair exactly over full shingles
    inter = (
        pairs.select("id_a", "id_b")
        .join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("shingle").alias("shingle_b")),
            "id_b",
        )
        .filter(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3, k: int = 64
) -> DataFrame:
    """k-permutation MinHash signatures via seeded xxhash64 over shingles:
    (id, sig array<long>[k])."""
    sh = shingles(df, id_col, text_col, n)
    mins = sh.groupBy("id").agg(
        *[F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(k)]
    )
    return mins.select("id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signatures and bucket-join: docs sharing any band bucket are
    candidates. (id_a < id_b distinct pairs.)"""
    k = None  # derived from array length at runtime
    sig = signatures
    rows_per_band = F.floor(F.size("sig") / bands).cast("int")
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), (b * rows_per_band + 1).cast("int"), rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: LSH candidates verified by exact
    Jaccard (verify step keeps precision exact; LSH bounds the candidate
    set so nothing is all-pairs)."""
    sigs = minhash_signatures(df, id_col, text_col, n, k)
    cand = lsh_candidate_pairs(sigs, bands)
    sh = shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("shingle").alias("shingle_b")), "id_b")
        .filter(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 56) -> DataFrame:
    """SimHash fingerprints: per-token md5-derived bit vectors, sign-summed.
    Uses the top `bits` of md5 (as a 14-hex-digit int) so the same value is
    computable in ANSI SQL for oracle parity. Returns (id, simhash:long)."""
    toks = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("tok")
    base = df.select(F.col(id_col).alias("id"), toks)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 14), 16, 10).cast("long")
    base = base.select("id", h.alias("h"))
    agg = base.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select("id", sim.alias("simhash"))
