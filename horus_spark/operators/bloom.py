"""Bloom-filter pre-filter tier for benchmark decontamination.

`decontaminate` (decontam.py) probes corpus n-grams against the
benchmark's distinct digest set. At 100 TB the exact digest set can
reach GBs (16 bytes x |bench grams|): too big to broadcast, so the
probe degrades to a corpus-wide shuffle equi-join. This module adds the
classic fix — the same trick Spark's own runtime filter pushdown uses:

- tier 1: aggregate the benchmark grams into a COMPACT Bloom bitmap of
  m bits (m/8 bytes total, independent of benchmark size). Building it
  is one bit_or aggregation over at most m/64 (word_idx, word) rows;
  the driver-side collect is bounded by m/64 rows BY CONSTRUCTION
  (default m=2^16 -> 8 KiB), not by data size.
- tier 2: probe every corpus gram against the bitmap with a pure
  map-side expression (the bitmap rides in the plan as an array<long>
  literal — no join, no shuffle, no Python). Grams whose k positions
  are not all set CANNOT be contaminated (no false negatives) and are
  dropped before any join.
- tier 3: the surviving grams (true hits + false positives, rate
  ~ (1 - e^{-k*n/m})^k) go through the exact digest join, which now
  moves orders of magnitude fewer corpus rows.

The final answer is bit-identical to `decontaminate` — the bloom is a
performance tier, so the oracle for the q50 gate is the same exact SQL
as q47's, which is precisely the property being verified (a false
negative would change the answer and fail the hash match).

Determinism: positions are derived from md5(gram_digest || '#i') — no
RNG, no JVM hash seeds — so the bitmap and the probe are reproducible
across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.decontam import _shingle_hashes


# 64-entry bit table (F.shiftleft only takes a literal shift count, so
# a column-indexed lookup stands in); entry 63 is the sign bit as a
# signed long
_BIT_TABLE = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


def _bit_expr(pos: F.Column) -> F.Column:
    return F.element_at(F.lit(_BIT_TABLE), (pos % 64).cast("int") + 1)


def _position(gram: F.Column, i: int, m_bits: int) -> F.Column:
    """i-th bloom position for a gram digest: md5-derived uniform in
    [0, m_bits) via the package-wide sampling.md5_long construction."""
    from horus_spark.operators.sampling import md5_long

    return (md5_long(gram, f"#{i}") % m_bits).cast("long")


def _positions_array(gram: F.Column, k_hashes: int, m_bits: int) -> F.Column:
    return F.array(*[_position(gram, i, m_bits) for i in range(k_hashes)])


def build_bloom(
    grams: DataFrame,
    gram_col: str = "gram",
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> list[int]:
    """Aggregate a gram column into a dense bloom bitmap (list of
    m_bits/64 longs). The shuffle carries at most m_bits/64 rows (the
    bit_or aggregation is map-side combined), and the collect is bounded
    by the same constant — the whole point of a bloom filter."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = grams.select(
        F.explode(_positions_array(F.col(gram_col), k_hashes, m_bits)).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            _bit_expr(F.col("pos")).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    bitmap = [0] * (m_bits // 64)
    for row in words.collect():  # bounded: <= m_bits/64 rows by construction
        bitmap[row["word_idx"]] = row["word"]
    return bitmap


def bloom_probe_expr(
    gram: F.Column, bitmap: list[int], k_hashes: int
) -> F.Column:
    """True iff all k positions of the gram are set in the bitmap — a
    pure map-side expression over an array<long> literal (no join)."""
    m_bits = len(bitmap) * 64
    lit_map = F.lit(bitmap)
    checks = []
    for i in range(k_hashes):
        p = _position(gram, i, m_bits)
        word = F.element_at(lit_map, (p / 64).cast("int") + 1)
        checks.append(word.bitwiseAND(_bit_expr(p)) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    min_collisions: int = 1,
    normalize: bool = True,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """`decontaminate` with a bloom pre-filter in front of the exact
    digest join. Same output schema and IDENTICAL answers (the bloom has
    no false negatives; false positives are removed by the exact join).

    Scale shape vs the plain version: per-doc n_shingles is counted in a
    separate aggregation whose shuffle carries only (doc_id, count)
    pairs; the exact join then sees only bloom-surviving grams — when
    contamination is rare (the normal case) that is a tiny fraction of
    the corpus, which is what makes the non-broadcast fallback
    (broadcast_benchmark=False, co-partitioned digest join) viable at
    benchmark sizes that could never broadcast.
    """
    corpus_grams = _shingle_hashes(corpus, id_col, text_col, n, normalize)
    bench_grams = (
        _shingle_hashes(benchmark, bench_id_col, bench_text_col, n, normalize)
        .select("gram")
        .distinct()
    )

    # per-doc total gram counts: map-side combined, (id, count) shuffle only
    totals = corpus_grams.groupBy("id").agg(F.count("*").alias("n_shingles"))

    # tier 1+2: compact bitmap, map-side probe
    bitmap = build_bloom(bench_grams, "gram", m_bits, k_hashes)
    survivors = corpus_grams.filter(bloom_probe_expr(F.col("gram"), bitmap, k_hashes))

    # tier 3: exact digest join on survivors only
    bench_exact = bench_grams.withColumn("_hit", F.lit(1))
    if broadcast_benchmark:
        bench_exact = F.broadcast(bench_exact)
    collisions = (
        survivors.join(bench_exact, "gram", "inner")
        .groupBy("id")
        .agg(F.count("*").alias("n_collisions"))
    )

    base = corpus.select(F.col(id_col).alias("id"))
    return (
        base.join(totals, "id", "left")
        .join(collisions, "id", "left")
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
