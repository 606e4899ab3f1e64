"""Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 —
the MOSS algorithm): position-robust document fingerprints for local
(substring-level) duplicate detection.

Where minhash (dedup.py) estimates WHOLE-document resemblance and the
sliding-window exact tier (q61) needs a candidate pair first, winnowing
selects a GUARANTEED-coverage subset of k-gram hashes per document:
from every window of w consecutive k-gram hashes, keep the minimum.
The guarantee (theorem 1 of the paper): any shared substring of at
least w + k - 1 tokens between two documents produces at least one
IDENTICAL selected fingerprint in both — so an equi-join on selected
fingerprints finds all long-enough local overlaps, while storing only
~2/(w+1) of the grams.

Shape at scale (the 100 TB direction):
- selection is a PURE MAP-SIDE array expression per document (grams
  via the portable md5 60-bit hash, window minima via
  transform+slice+array_min): zero Python, zero shuffle, per-doc cost
  O(n_grams * w) with w a small constant.
- the candidate join shuffles (fingerprint, id) pairs only — 8-byte
  hashes, never text. Like every posting-list join in this package it
  takes a df cap: fingerprints appearing in more than `max_df`
  documents (boilerplate/common passages) are dropped before the
  self-join, bounding per-key fan-out at max_df^2.
- tie-break note: the paper's "rightmost minimum" rule minimizes
  fingerprint DENSITY; since we emit the distinct selected hash VALUES
  (not positions), equal-valued minima select the same value under any
  tie rule — the output is tie-rule-invariant and therefore exactly
  replayable by any engine.

Tokenization mirrors decontam/dedup normalization (lower, strip
non-alphanumerics, collapse whitespace) so "substring" means the same
thing across the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.decontam import _norm_text

_HASH_HEX = 15  # 60-bit md5 prefix, same construction as sampling.md5_long


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    salt: str = "",
) -> DataFrame:
    """Per document: the distinct winnowed k-gram hash set.

    Returns (id, fp: long) exploded — one row per selected fingerprint.
    Documents with fewer than k tokens emit no rows (no k-gram exists).
    When a document has fewer than w grams the window shrinks to the
    gram count (a single all-grams window), so every document with at
    least one gram emits at least one fingerprint.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = F.split(_norm_text(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter((F.col("_n") >= k) & (F.length(F.array_join("_toks", "")) > 0))

    gram_hash = lambda i: F.conv(  # noqa: E731 — 60-bit portable hash
        F.substring(
            F.md5(
                F.concat(
                    F.array_join(F.slice("_toks", i + 1, k), " "), F.lit(salt)
                )
            ),
            1,
            _HASH_HEX,
        ),
        16,
        10,
    ).cast("long")
    grams = F.transform(F.sequence(F.lit(0), F.col("_n") - k), gram_hash)

    with_grams = base.select("id", grams.alias("_grams"), F.size(grams).alias("_ng"))
    wlen = F.least(F.lit(w), F.col("_ng"))
    sel = F.transform(
        F.sequence(F.lit(1), F.col("_ng") - wlen + 1),
        lambda j: F.array_min(F.slice("_grams", j, wlen)),
    )
    return with_grams.select(
        "id", F.explode(F.array_distinct(sel)).alias("fp")
    )


def winnow_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    salt: str = "",
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowed fingerprints —
    candidates for substring-level duplication (every shared passage of
    >= w + k - 1 tokens is caught; see module docstring). Fingerprints
    present in more than max_df documents are dropped before the join.

    Returns (id_a, id_b, n_shared: long), id_a < id_b under the id
    column's native ordering.
    """
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if max_df < 2:
        raise ValueError("max_df must be >= 2 (df=1 prints cannot pair)")
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w, salt=salt)
    df_f = fps.groupBy("fp").agg(F.count("*").alias("_df"))
    # no broadcast hint on the df table: distinct fingerprints are
    # corpus-scale (a forced broadcast OOMs at 100 TB); the hash join on
    # fp co-partitions with the df aggregation, and AQE still broadcasts
    # when the pruned set actually fits.
    kept = fps.join(
        df_f.filter((F.col("_df") >= 2) & (F.col("_df") <= max_df)),
        "fp",
    ).select("fp", "id")
    a = kept.select("fp", F.col("id").alias("id_a"))
    b = kept.select("fp", F.col("id").alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
