"""Fuzzy vocabulary matching via deletion-neighborhood blocking
(the SymSpell construction, Garbe 2012; same family as FastSS,
Bocek et al. 2007).

OCR output, user-generated text and crawl noise fill a corpus
vocabulary with single-edit variants of real words ("recieve",
"goverment", OCR "rn"->"m" confusions). Finding them exactly is an
edit-distance-1 self-join — O(V^2) with naive pairing, impossible at a
web-scale vocabulary. The deletion-neighborhood trick makes it linear:

  every word emits itself plus each single-character deletion
  (len+1 slim variants); two words at edit distance <= 1 ALWAYS share
  a variant (substitution: delete the differing position from both;
  insertion/deletion: the shorter word is itself a variant of the
  longer), so the variant equi-join finds every true pair.

The converse does not hold (distinct deletions can collide two words
at distance 2, e.g. "abX"/"aYb" both emit "ab"), so survivors are
verified with an exact `levenshtein <= 1` — the classic
generate-cheap / verify-exact shape this repo uses for every dedup
tier. Verification runs on the DEDUPLICATED candidate pairs, not the
variant explosion.

Scale shape: one corpus-scale token count (map-side combine), then
everything is vocabulary-sized: the variant table is V * (len+1) slim
(word, variant) rows, the candidate join is a hash equi-join on
variant, and the verify is a projection. `max_len` bounds the variant
fanout (URLs and base64 junk would otherwise dominate; real spelling
variants live in short words). Exact integer/string ops end to end —
the DuckDB oracle replays the construction and hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletion_variants(word: Column) -> Column:
    """array of the word itself + every single-character deletion."""
    return F.transform(
        F.sequence(F.lit(0), F.length(word)),
        lambda i: F.when(i == 0, word).otherwise(
            F.concat(
                word.substr(F.lit(1), i - 1),
                word.substr(i + 1, F.length(word)),
            )
        ),
    )


def edit1_pairs(
    tokens: DataFrame,
    token_col: str = "token",
    max_len: int = 20,
    min_count: int = 1,
) -> DataFrame:
    """Exact edit-distance-<=1 vocabulary pairs: (word_a, word_b,
    count_a, count_b, dist) with word_a < word_b, dist in {0 is
    impossible, 1}. Input: one row per token OCCURRENCE (counts are
    aggregated here). Words longer than max_len or rarer than
    min_count are excluded from pairing."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    vocab = (
        tokens.select(F.col(token_col).alias("w"))
        .filter((F.col("w") != "") & F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(
            (F.length("w") <= max_len) & (F.col("cnt") >= min_count)
        )
    )
    variants = vocab.select(
        "w", F.explode(_deletion_variants(F.col("w"))).alias("var")
    ).distinct()  # "aab" emits "ab" twice (delete pos 2 or 3)
    cand = (
        variants.alias("a")
        .join(variants.alias("b"), "var")
        .where(F.col("a.w") < F.col("b.w"))
        .select(
            F.col("a.w").alias("word_a"), F.col("b.w").alias("word_b")
        )
        .distinct()
    )
    verified = cand.where(
        F.levenshtein("word_a", "word_b") <= 1
    ).withColumn("dist", F.levenshtein("word_a", "word_b").cast("int"))
    ca = vocab.select(
        F.col("w").alias("word_a"), F.col("cnt").alias("count_a")
    )
    cb = vocab.select(
        F.col("w").alias("word_b"), F.col("cnt").alias("count_b")
    )
    return verified.join(ca, "word_a").join(cb, "word_b").select(
        "word_a", "word_b", "count_a", "count_b", "dist"
    )


def spelling_variants(
    tokens: DataFrame,
    token_col: str = "token",
    max_len: int = 20,
    dominance: int = 10,
) -> DataFrame:
    """Correction view over edit1_pairs: for each pair where one side
    is >= `dominance` times more frequent, emit (variant, canonical,
    variant_count, canonical_count) — the rare spelling mapped to the
    dominant one. The classic frequency-asymmetry heuristic: true
    typos are orders of magnitude rarer than their corrections."""
    p = edit1_pairs(tokens, token_col, max_len)
    a_canon = p.where(F.col("count_a") >= F.col("count_b") * dominance).select(
        F.col("word_b").alias("variant"),
        F.col("word_a").alias("canonical"),
        F.col("count_b").alias("variant_count"),
        F.col("count_a").alias("canonical_count"),
    )
    b_canon = p.where(F.col("count_b") >= F.col("count_a") * dominance).select(
        F.col("word_a").alias("variant"),
        F.col("word_b").alias("canonical"),
        F.col("count_a").alias("variant_count"),
        F.col("count_b").alias("canonical_count"),
    )
    return a_canon.unionByName(b_canon)
