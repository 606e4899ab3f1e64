"""Semantic deduplication over embedding space (SemDeDup, Abbas et al.
2023, arXiv:2303.09540): cluster the corpus's embeddings into k cells,
then within each cell drop all but one member of every group whose
pairwise cosine similarity exceeds a threshold. Catches paraphrase-level
duplicates that token-level minhash/simhash miss.

Shape at scale:
- Cell assignment reuses the IVF map-side argmax projection
  (similarity._assign_cells): centroids are a driver constant, corpus
  rows touch ZERO Exchange to get their cell.
- Candidate pairs are generated ONLY within a cell — the self-join key is
  `cell`, so the Exchange partitions the corpus k ways and the quadratic
  blow-up is bounded per cell (k is chosen so cells fit: SemDeDup's own
  recipe, k ~ sqrt(n) or larger). No corpus-wide crossJoin anywhere.
- Embedding payloads cross the pair-join Exchange once (both legs carry
  vec); with very wide vectors, quantize first (quantize_embeddings) or
  raise n_centroids to shrink cells.
- The threshold graph is closed into canonical clusters with the
  large-star/small-star components operator — transitivity matters here
  (A~B, B~C puts A,C in one group even below threshold), which is what
  the published recipe's per-cluster "keep one" amounts to.

Determinism: with an explicit centroid list (or 'lowest_id') the whole
pipeline is deterministic and SQL-expressible — that's what the q48
oracle runs. 'kmeans' (default) is the production strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.components import assign_clusters
from horus_spark.operators.similarity import _assign_cells, _resolve_centroids, cosine_expr


def semantic_pairs(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | str = "kmeans",
) -> DataFrame:
    """Within-cell near-duplicate pairs: (id_a, id_b, cell, cos) with
    id_a < id_b and round(cos, 6) >= threshold. Pairs crossing a cell
    boundary are not generated — that recall loss is the documented
    SemDeDup trade (mitigate with more probes only if measurements
    demand it; the published recipe accepts it)."""
    cents = _resolve_centroids(embeddings, centroids, n_centroids, id_col, vec_col)
    assigned = _assign_cells(embeddings, cents, id_col, vec_col).filter(
        F.col("cell") >= 0
    )
    a = assigned.select(
        F.col("neighbor_id").alias("id_a"), F.col("vec").alias("vec_a"), "cell"
    )
    b = assigned.select(
        F.col("neighbor_id").alias("id_b"), F.col("vec").alias("vec_b"), "cell"
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine_expr(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cell", "cos")
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | str = "kmeans",
) -> DataFrame:
    """Full-corpus semantic dedup assignment: every embedding row mapped
    to (id, cluster_id, cluster_size, is_duplicate) where cluster_id is
    the minimum id of its within-cell cosine-threshold component and
    is_duplicate marks every non-canonical member. Filter
    `~is_duplicate` for the kept corpus."""
    pairs = semantic_pairs(
        embeddings, n_centroids, threshold, id_col, vec_col, centroids
    )
    out = assign_clusters(embeddings, pairs, id_col=id_col)
    return out.select(
        F.col("id").alias(id_col),
        "cluster_id",
        "cluster_size",
        (F.col("id") != F.col("cluster_id")).alias("is_duplicate"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "b_id",
    bench_vec_col: str = "b_vec",
) -> DataFrame:
    """Semantic benchmark decontamination (the FineWeb/Llama-recipe
    complement to q47's exact n-gram tier): flag corpus documents whose
    EMBEDDING sits within `threshold` cosine of any benchmark item —
    paraphrased or reformatted eval leakage that exact n-gram collision
    provably misses. Returns (id, nearest_benchmark, max_cos,
    contaminated).

    Scale shape: the benchmark side is eval-set-sized — broadcast; the
    corpus crosses ONE map-side broadcast join (n x |bench| slim rows
    never hit a shuffle) and the per-doc argmax is a struct-max hash
    aggregation with map-side combine (no window over the pair set).
    For benchmark sets too big to broadcast, pre-prune with the q25
    cell assignment (same composition as ivf_quantized_topk) — the
    verdict rule is unchanged."""
    b = benchmark.select(
        F.col(bench_id_col).alias("_bid"),
        F.col(bench_vec_col).cast("array<double>").alias("_bvec"),
    )
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
    )
    pairs = c.join(F.broadcast(b)).withColumn(
        "_cos", F.round(cosine_expr(F.col("_vec"), F.col("_bvec")), 6)
    )
    # argmax via struct max (cos desc, bench id asc) — map-side combinable
    agg = pairs.groupBy("id").agg(
        F.max(
            F.struct(
                F.col("_cos").alias("c"),
                (-F.col("_bid")).cast("long").alias("nb"),
            )
        ).alias("m")
    )
    return agg.select(
        "id",
        (-F.col("m.nb")).alias("nearest_benchmark"),
        F.col("m.c").alias("max_cos"),
        (F.col("m.c") >= float(threshold)).cast("int").alias("contaminated"),
    )
