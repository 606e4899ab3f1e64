"""Connected components over near-duplicate pair graphs.

The dedup operators (dedup.py, similarity.py) emit PAIRS — (id_a, id_b)
edges whose endpoints are near-duplicates. A pipeline that keeps one copy
per duplicate GROUP needs the transitive closure of those pairs: if A~B
and B~C, then {A, B, C} is one cluster even when (A, C) was never a
candidate pair. This module computes that closure as a DataFrame-native
iterative algorithm sized for 100 TB pair graphs.

Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014). Each round is
two shuffle stages (a per-node min under a window + an edge re-emit);
the edge set provably converges in O(log n) rounds to a union of stars,
each non-root node pointing at its component's minimum id. This is the
standard at-scale choice over naive label propagation, whose round count
is the graph DIAMETER — a 50-link chain of near-dup pages takes 50
propagation rounds but ~6 star rounds.

Scale notes:
- Each iteration's output is `localCheckpoint`ed: iterative lineage
  otherwise grows the plan exponentially and re-executes every prior
  round on each action. (On a cluster with reliable storage, swap in
  `checkpoint()` against a checkpoint dir for fault tolerance; local
  checkpoint trades re-computability for zero-I/O truncation, the right
  default for a bounded iterative refinement.)
- Convergence is detected by an (edge-count, xxhash64-sum) signature —
  one tiny two-value aggregate per round, no edge-set subtract join.
- Components from dedup are typically tiny (bounded by the candidate
  guards upstream), so the per-node windows stay narrow; the hot-key
  risk lives in candidate generation, which dedup.py already bounds.

Reference parity note: the reference engine has no graph stage (its dedup
is the per-document MD5 thumbprint, DocumentProcessor.cs:212-224); this
operator extends the LLM-data-pipeline tier the same way minhash/simhash
do — pairs in, canonical clusters out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-LARGER
    neighbors to the minimum of its neighborhood (min over N(u) and u).

    Emits (v, m) for each neighbor v > u, where m = min(N(u) + {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient every edge from its larger endpoint u
    to its smaller endpoint v, then per u connect all smaller neighbors
    (and u itself) to m = min of the smaller neighbors.

    Emits (v, m) for each smaller neighbor v != m, plus (u, m)."""
    d = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    w = Window.partitionBy("u")
    dm = d.withColumn("m", F.min("v").over(w))
    re_pointed = dm.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    roots = dm.select("u", F.col("m").alias("v")).distinct()
    return re_pointed.union(roots).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Cheap edge-set signature for convergence detection: (count,
    XOR of per-edge 64-bit hashes). The edge set is distinct, so the
    xor-fold is a valid set signature, never overflows under ANSI mode
    (unlike a long sum), and collision odds are ~2^-64 per round —
    negligible against an exact subtract's two extra shuffles."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Connected components of the undirected graph given by `pairs`.

    Returns (id, cluster_id) for every id APPEARING IN PAIRS, where
    cluster_id is the minimum id in the node's component. Nodes with no
    pairs are absent (join the full corpus with `assign_clusters` to get
    singleton rows). Ids may be any orderable type; min is taken in that
    type's ordering (lexicographic for strings — the same canonical-id
    choice as dedup.exact_dedup).

    Runs large-star/small-star rounds until the edge-set signature is
    stable; raises after `max_iter` non-converged rounds (the algorithm
    is O(log n) rounds, so hitting 25 means something is wrong with the
    input, not the loop)."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sig = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges))
        if use_local_checkpoint:
            edges = edges.localCheckpoint(eager=False)
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # fixpoint is a union of stars: every non-root points at its
    # component min; roots appear only on the v side — union in the
    # (root, root) rows so EVERY id appearing in pairs gets a row (the
    # documented contract; without them, `id == cluster_id` selects no
    # canonical member and per-cluster counts are off by one)
    stars = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = edges.select(
        F.col("v").alias("id"), F.col("v").alias("cluster_id")
    ).distinct()
    return stars.unionByName(roots).groupBy("id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def assign_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Full-corpus cluster assignment: every row of `df` mapped to its
    near-dup cluster's canonical (minimum) id, singletons included, plus
    the cluster size.

    This is the keep-one-per-group step of a dedup pipeline: keep rows
    where id = cluster_id, or weight groups by cluster_size. Output:
    (id, cluster_id, cluster_size)."""
    cc = connected_components(pairs, id_a=id_a, id_b=id_b, max_iter=max_iter)
    ids = df.select(F.col(id_col).alias("id"))
    assigned = ids.join(cc, "id", "left").select(
        "id", F.coalesce("cluster_id", "id").alias("cluster_id")
    )
    w = Window.partitionBy("cluster_id")
    return assigned.withColumn(
        "cluster_size", F.count(F.lit(1)).over(w).cast("int")
    )


def keep_best_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """The dedup DECISION: close the near-dup pair graph into clusters
    and keep, per cluster, the single highest-quality document (ties
    broken by minimum id, so the choice is deterministic). This is what
    a curation pipeline actually executes after pair generation — "drop
    duplicates, but keep the best copy, not an arbitrary one" (RefinedWeb
    §3.4 keeps by earliest crawl; the quality column parameterizes that
    choice).

    Output: (id_col, cluster_id, cluster_size, quality_col, keep) for
    EVERY input row — filter on `keep` for the surviving corpus, or
    audit the dropped rows by cluster. Scale shape: clusters from the
    O(log n) large-star/small-star rounds; the winner selection is a
    row_number window that Spark plans as WindowGroupLimit (map-side
    top-1 per cluster before the exchange)."""
    assigned = assign_clusters(
        df, pairs, id_col=id_col, id_a=id_a, id_b=id_b, max_iter=max_iter
    )
    q = df.select(F.col(id_col).alias("id"), F.col(quality_col).alias("_q"))
    rn = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(
            F.col("_q").desc(), F.col("id").asc()
        )
    )
    return (
        assigned.join(q, "id")
        .withColumn("keep", rn == 1)
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            "cluster_size",
            F.col("_q").alias(quality_col),
            "keep",
        )
    )
