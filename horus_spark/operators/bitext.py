"""Margin-based bitext mining (Artetxe & Schwenk 2019; the
LASER/CCMatrix recipe): mine translation pairs from two embedding
spaces by MARGIN, not raw cosine — a pair is kept when its similarity
stands out against each side's nearest-neighbor background, which
kills the hub vectors that plain cosine-threshold mining drowns in.

Ratio margin, restated in EXACT integer arithmetic so the mined set is
a pure function of the data (float kNN averages are
reduction-order-dependent; integer micro-cosine sums are not):

    cos_micro(x, y)   = round(cosine(x, y) * 1e6)        (the 6-dp
                        rounding every similarity oracle here uses)
    sum_s(x), n_s(x)  = sum/count of x's top-k cos_micro into the
                        target side ((cos desc, id asc) order)
    sum_t(y), n_t(y)  = same for y into the source side
    margin_ppm(x, y)  = cos_micro * 2 * n_s * n_t * 1e6
                        div (sum_s * n_t + sum_t * n_s)

    mined: y is x's best target AND x is y's best source (mutual
    best, deterministic (cos, id) tie-break), cos_micro > 0, the
    denominator > 0, and margin_ppm >= threshold_ppm.

All divisions run on positive operands (guarded), so Spark `div` and
DuckDB `//` agree bit-for-bit — the q178 oracle replays the whole
recipe in SQL.

Scale shape — two tiers, selected by the `candidates` parameter:

  EXACT (candidates=None): corpus x corpus crossJoin with the smaller
  side broadcast, the same baseline contract as brute_force_topk
  (q23). Correct at any size, affordable only when one side is
  dimension-sized.

  CANDIDATE (candidates = a (src_id, tgt_id) DataFrame): scoring,
  the kNN background sums, mutuality and the margin all run over the
  candidate pairs ONLY — two id-keyed equi-joins attach the vectors,
  no crossJoin anywhere in the plan. This is the CCMatrix recipe
  verbatim: production LASER mining computes the margin over the
  APPROXIMATE neighborhood (FAISS kNN lists), not the exact one.
  `ivf_bitext_candidates` builds the standard candidate source
  (shuffle-free IVF cell assignment, q25's map-side pattern); the
  multiband LSH pairs (q30) or hreflang pairs (q188) plug in the same
  way. At 100 TB the candidate tier is the ONLY affordable shape.

The kNN background sums need only each side's top-k rows — slim
(id, cos_micro) windows, never payload vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horus_spark.operators.similarity import (
    _assign_cells,
    _probe_cells,
    _resolve_centroids,
    cosine_expr,
)


def margin_bitext_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold_ppm: int = 1_050_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Mine mutual-best translation pairs by ratio margin; see module
    docstring. Returns (src_id, tgt_id, cos_micro, margin_ppm).

    `candidates` (columns src_id, tgt_id; duplicates tolerated)
    switches to the scale tier: margin/mutuality/background run over
    the candidate pairs only, vectors attached by two id-keyed
    equi-joins — no crossJoin in the plan. Build candidates with
    `ivf_bitext_candidates`, lsh_cosine_pairs_multiband (q30), or any
    domain pairing (hreflang, q188)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    s = src.select(
        F.col(id_col).alias("src_id"),
        F.col(vec_col).cast("array<double>").alias("s_vec"),
    )
    t = tgt.select(
        F.col(id_col).alias("tgt_id"),
        F.col(vec_col).cast("array<double>").alias("t_vec"),
    )
    if candidates is None:
        pairs = s.crossJoin(F.broadcast(t))
    else:
        pairs = (
            candidates.select("src_id", "tgt_id")
            .distinct()
            .join(s, "src_id")
            .join(t, "tgt_id")
        )
    scored = pairs.select(
        "src_id",
        "tgt_id",
        F.round(cosine_expr(F.col("s_vec"), F.col("t_vec")) * 1_000_000)
        .cast("long")
        .alias("cos_micro"),
    )
    w_s = Window.partitionBy("src_id").orderBy(
        F.desc("cos_micro"), F.asc("tgt_id")
    )
    w_t = Window.partitionBy("tgt_id").orderBy(
        F.desc("cos_micro"), F.asc("src_id")
    )
    # checkpoint AFTER the windows: bg_s/bg_t/mutual all consume the
    # ranked frame, so both the crossJoin scoring and the two window
    # passes run once, not three times
    ranked = scored.select(
        "src_id",
        "tgt_id",
        "cos_micro",
        F.row_number().over(w_s).alias("rs"),
        F.row_number().over(w_t).alias("rt"),
    ).localCheckpoint(eager=False)
    bg_s = (
        ranked.where(F.col("rs") <= k)
        .groupBy("src_id")
        .agg(
            F.sum("cos_micro").alias("sum_s"),
            F.count(F.lit(1)).alias("n_s"),
        )
    )
    bg_t = (
        ranked.where(F.col("rt") <= k)
        .groupBy("tgt_id")
        .agg(
            F.sum("cos_micro").alias("sum_t"),
            F.count(F.lit(1)).alias("n_t"),
        )
    )
    mutual = ranked.where((F.col("rs") == 1) & (F.col("rt") == 1))
    j = mutual.join(bg_s, "src_id").join(bg_t, "tgt_id")
    denom = F.col("sum_s") * F.col("n_t") + F.col("sum_t") * F.col("n_s")
    out = j.where((F.col("cos_micro") > 0) & (denom > 0)).select(
        "src_id",
        "tgt_id",
        "cos_micro",
        F.expr(
            "CAST(cos_micro * 2 * n_s * n_t * CAST(1000000 AS BIGINT)"
            " div (sum_s * n_t + sum_t * n_s) AS BIGINT)"
        ).alias("margin_ppm"),
    )
    return out.where(F.col("margin_ppm") >= threshold_ppm)


def ivf_bitext_candidates(
    src: DataFrame,
    tgt: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 2,
    centroids: list[list[float]] | str = "kmeans",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF candidate pairs for the bitext scale tier: each TARGET
    vector lands in its nearest-centroid cell (similarity._assign_cells
    — one map-side projection over a driver-constant centroid array,
    ZERO Exchange on corpus rows, q25's pattern), each SOURCE vector
    probes its top-`n_probe` cells, and candidates are the same-cell
    (src_id, tgt_id) pairs from one cell-keyed equi-join. Returns
    (src_id, tgt_id) — feed straight into
    `margin_bitext_pairs(candidates=...)`.

    Centroid strategies are _resolve_centroids': an explicit list, the
    sample-fit spherical k-means default, or 'lowest_id' (the
    deterministic SQL-parity stand-in the q191 oracle replays — drawn
    from the TARGET side, the side being indexed).

    Scale shape: both cell assignments are map-side; the only shuffle
    is the cell equi-join, and cells carry id-only payloads (vectors
    are dropped BEFORE the join, reattached later by
    margin_bitext_pairs' id-keyed joins). Recall follows the IVF
    contract: a true pair in disjoint probe sets is missed — raise
    n_probe for recall, audit like q184."""
    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    cents = _resolve_centroids(tgt, centroids, n_centroids, id_col, vec_col)
    t_cells = _assign_cells(tgt, cents, id_col, vec_col).select(
        F.col("neighbor_id").alias("tgt_id"), "cell"
    )
    s_q = src.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    s_cells = _probe_cells(s_q, cents, n_probe).select(
        F.col("q_id").alias("src_id"), "cell"
    )
    return s_cells.join(t_cells, "cell").select("src_id", "tgt_id")
