"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (GPT-3 appendix C / Gopher
appendix A.2 style: a training doc is contaminated when any of its
n-grams collides with an n-gram drawn from the held-out benchmark).

Shape at scale (the 100 TB direction):
- The benchmark side is tiny relative to the corpus (eval suites are
  10^4-10^6 documents), so its DISTINCT n-gram set is reduced first and
  broadcast: the corpus-side probe is then a map-side broadcast hash
  join — the 100 TB corpus is never shuffled on n-gram keys.
- Corpus n-grams stream through an explode -> broadcast-probe -> per-doc
  partial count; only (doc_id, matched_flag) survives to the one hash
  Exchange (map-side combine collapses it to one row per doc per
  partition before the shuffle).
- Join keys are md5 digests (32 hex chars, constant width) rather than
  raw n-gram strings: smaller broadcast, no long-string comparisons,
  collision-free at any realistic scale (128-bit).
- For benchmark sets too large to broadcast, pass
  broadcast_benchmark=False to fall back to a co-partitioned shuffle
  equi-join on the digest; benchmark n-grams are distinct so no key is
  hot. (A bloom_filter_agg pre-filter in front of that join is the next
  tier if the benchmark ever reaches corpus scale — not needed here.)

Normalization (normalize=True) mirrors the Gopher recipe and this
package's fingerprint_expr: lowercase, strip non-alphanumerics, collapse
whitespace — so trivial formatting differences don't hide contamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.dedup import _shingle_array


def _norm_text(col: F.Column) -> F.Column:
    # whitespace (incl. newlines/tabs) becomes a SPACE before the
    # non-alphanumeric strip — deleting a '\n' outright would merge the
    # words around a line break ('fox\njumps' -> 'foxjumps') and hide
    # contamination that differs only in line wrapping
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    norm = F.regexp_replace(norm, r"[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(norm, r" +", " "))


def _shingle_hashes(df: DataFrame, id_col: str, text_col: str, n: int, normalize: bool) -> DataFrame:
    text = _norm_text(F.col(text_col)) if normalize else F.col(text_col)
    prepared = df.select(F.col(id_col).alias("id"), text.alias("_t"))
    return prepared.select(
        "id", F.explode(_shingle_array("_t", n)).alias("shingle")
    ).select("id", F.md5("shingle").alias("gram"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    min_collisions: int = 1,
    normalize: bool = True,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per corpus document: distinct n-gram count, how many of those
    n-grams also occur anywhere in the benchmark, the contaminated
    fraction, and an is_contaminated flag (>= min_collisions hits).

    Documents with fewer than n tokens have zero n-grams and are never
    flagged (n_shingles = 0, contam_frac = 0.0) — matching the reference
    recipe, which only filters on n-gram evidence.
    """
    corpus_grams = _shingle_hashes(corpus, id_col, text_col, n, normalize)
    bench_grams = (
        _shingle_hashes(benchmark, bench_id_col, bench_text_col, n, normalize)
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)

    hits = (
        corpus_grams.join(bench_grams, "gram", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_collisions"),
        )
    )
    # left join back so zero-shingle docs (shorter than n tokens) keep a row
    base = corpus.select(F.col(id_col).alias("id"))
    return (
        base.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_collisions", F.lit(0)).cast("long").alias("n_collisions"),
            F.round(
                F.when(
                    F.coalesce("n_shingles", F.lit(0)) > 0,
                    F.coalesce("n_collisions", F.lit(0)) / F.col("n_shingles"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contam_frac"),
            (F.coalesce("n_collisions", F.lit(0)) >= min_collisions).alias("is_contaminated"),
        )
    )
