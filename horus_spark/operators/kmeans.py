"""Distributed Lloyd's k-means over the full corpus — deterministic,
engine-replayable, and shaped for 100 TB.

Why this exists next to `similarity.kmeans_centroids`: the sample-fit
recipe (bounded 2048-row collect, numpy on the driver) is the right
DEFAULT for IVF cell layouts, but it never sees the tail of the
distribution. This operator runs true Lloyd iterations over EVERY row
with the cluster-update arithmetic exact, so the result is a pure
function of the data — bit-identical on any engine, any partitioning —
and a DuckDB recursive CTE can replay all iterations and hash-match it.

Per-iteration shape (the Spark-MLlib shape, made deterministic):

- ASSIGNMENT is a map-side projection: the centroid set is a driver
  constant, so each row scores all k centroids in one expression array
  and takes argmin via array_position(array_min) — first match = lowest
  cluster id tie-break, ZERO Exchange on corpus rows (the same pattern
  as similarity._assign_cells; a crossJoin + window here would shuffle
  corpus x k rows carrying full vectors).
- UPDATE is one aggregation: posexplode dims -> groupBy (cluster, dim)
  with map-side partial sums — the exchange carries k x d partials per
  task, never vectors. Sums accumulate as EXACT micro-int longs
  (round(x*1e6), the package convention), so they are
  summation-order-free.
- The new centroid component is s / (n * 1e6) in plain double division
  of exact integers — IEEE-identical in Python, Spark, and DuckDB, so
  NO rounding is needed between iterations and the replay stays exact.
  (Exactness bound: |s| < 2^53 requires n_rows * 1e6 * max|x| < 9e15 —
  fine to ~10^9 rows of unit-scale embeddings per cluster; raise the
  micro scale down or switch the final report to rounded means beyond
  that.)
- Per iteration the driver collects k x (d sums + count) — the k-row
  centroid state, NOT corpus data (MLlib's treeAggregate does the
  same). Empty clusters keep their previous centroid (the classic
  choice, replayed identically by the oracle).

Determinism contract: init = the k lowest-id vectors (deterministic,
engine-portable); distances are double arithmetic over identical
formulas (left-fold sum of (x-c)^2 — the same fold the cosine oracles
proved compatible with DuckDB's list_sum); argmin ties break to the
lowest cluster index on bit-equal distances.

Reference parity note: the reference has no clustering stage; this
extends the LLM-data-pipeline tier (SemDeDup/IVF cell layouts gain a
full-corpus refinement path; cited shape: Lloyd 1982).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _l2sq(vec, cent: list[float]):
    """Left-fold sum of squared differences against a literal centroid —
    the same fold order DuckDB's list_sum replays."""
    lit = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_expr(vec, centroids: list[list[float]]):
    """argmin cluster id over literal centroids; first-min = lowest id."""
    dists = F.array(*[_l2sq(vec, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_fit_full(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
) -> list[list[float]]:
    """Full-corpus Lloyd iterations; returns the final centroid list
    (driver-side, k x d floats). Runs n_iter iterations from the
    k lowest-id vectors; each iteration is one corpus aggregation."""
    if k < 1 or n_iter < 0:
        raise ValueError("k must be >= 1 and n_iter >= 0")
    init_rows = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init_rows)}")
    cents = [list(r[0]) for r in init_rows]
    d = len(cents[0])

    base = df.select(F.col(vec_col).cast("array<double>").alias("v")).filter(
        F.col("v").isNotNull()
    )
    for _ in range(n_iter):
        assigned = base.withColumn("c", _assign_expr(F.col("v"), cents))
        sums = (
            assigned.select(
                "c", F.posexplode("v").alias("dim", "x")
            )
            .groupBy("c", "dim")
            .agg(
                F.sum(F.round(F.col("x") * MICRO).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty cluster keeps previous
        by_cluster: dict[int, list] = {}
        for r in sums:
            by_cluster.setdefault(r["c"], []).append(r)
        for cid, rows in by_cluster.items():
            for r in rows:
                # exact-integer double division — engine-identical
                new_cents[cid][r["dim"]] = r["s"] / (r["n"] * MICRO)
        cents = new_cents
    return cents


def kmeans_clusters(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
) -> DataFrame:
    """Cluster summary after full-corpus Lloyd: (cluster_id, n_points,
    centroid) with the centroid rounded to 9dp for display (the
    underlying iteration state is unrounded). Rows with NULL vectors
    are excluded (they have no position in the space)."""
    cents = kmeans_fit_full(df, id_col, vec_col, k=k, n_iter=n_iter)
    base = df.select(F.col(vec_col).cast("array<double>").alias("v")).filter(
        F.col("v").isNotNull()
    )
    assigned = base.withColumn("c", _assign_expr(F.col("v"), cents))
    cent_lit = F.array(
        *[
            F.array(*[F.round(F.lit(float(x)), 9) for x in c])
            for c in cents
        ]
    )
    return (
        assigned.groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(
            F.col("c").alias("cluster_id"),
            "n_points",
            F.element_at(cent_lit, F.col("c") + 1).alias("centroid"),
        )
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-side cluster assignment against a fitted centroid list:
    (id_col, cluster_id). Zero Exchange — composes with IVF/SemDeDup
    as the full-corpus refinement of their cell layouts."""
    return df.select(
        F.col(id_col),
        _assign_expr(F.col(vec_col).cast("array<double>"), centroids).alias(
            "cluster_id"
        ),
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
    per_cluster: int = 5,
    salt: str = "cbs",
) -> DataFrame:
    """Diversity-preserving downsample: an equal quota of points from
    every k-means cluster (the SSL-prototypes / DataComp idea — a
    uniform sample over-represents the corpus's dense modes; an equal
    per-cluster quota keeps the rare modes in the training mix).

    Composition of proven parts: the exact-replay full-corpus Lloyd fit
    (kmeans_fit_full — the oracle can replay the centroids bit-exactly),
    a zero-Exchange map-side assignment, and a WindowGroupLimit top-k
    per cluster ordered by the package hash (md5_long(id, salt), id) —
    a deterministic uniform draw WITHIN each cluster, so the pick is
    reproducible and engine-portable. Returns (id_col, cluster_id,
    pick_rank 1..per_cluster).

    Scale: one aggregation per Lloyd iteration + one WindowGroupLimit
    shuffle carrying at most partitions x k x per_cluster rows; NULL
    vectors are excluded (no position in the space)."""
    if per_cluster < 1:
        raise ValueError("per_cluster must be >= 1")
    from horus_spark.operators.sampling import md5_long
    from horus_spark.operators.topk import top_k_per_key

    cents = kmeans_fit_full(df, id_col, vec_col, k=k, n_iter=n_iter)
    assigned = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        _assign_expr(F.col(vec_col).cast("array<double>"), cents).alias(
            "cluster_id"
        ),
        md5_long(F.col(id_col), salt).alias("hk"),
    )
    picked = top_k_per_key(
        assigned, ["cluster_id"], "hk", per_cluster,
        descending=False, tie_col=id_col,
    )
    return picked.select(
        id_col, "cluster_id", F.col("rank").cast("int").alias("pick_rank")
    )
