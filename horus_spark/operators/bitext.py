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

Scale shape: this is the EXACT tier — candidate scoring is a
crossJoin with the smaller side broadcast, the same baseline contract
as brute_force_topk (q23); at 100 TB compose the candidate stage with
the IVF cell assignment (q25/q39) or the multiband LSH pairs (q30) so
only same-cell/same-bucket pairs are scored, then apply this module's
margin arithmetic to the surviving candidates unchanged. The kNN
background sums need only each side's top-k rows — slim
(id, cos_micro) windows, never payload vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horus_spark.operators.similarity import cosine_expr


def margin_bitext_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold_ppm: int = 1_050_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mine mutual-best translation pairs by ratio margin; see module
    docstring. Returns (src_id, tgt_id, cos_micro, margin_ppm)."""
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
    scored = s.crossJoin(F.broadcast(t)).select(
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
