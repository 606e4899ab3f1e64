"""Embedding pooling: element-wise mean of vectors per group — chunk
embeddings -> document embedding, document embeddings -> class/cluster
centroid (the aggregation step of IVF training, SemDeDup centroids, and
doc-level ANN over chunked corpora).

Shape at scale: posexplode -> ONE (key, pos) hash aggregation with
map-side combine (the shuffle carries dims x n_keys partial sums, not
vectors) -> per-key reassembly via sort_array(collect_list) over
exactly `dims` rows per key. No Python, no driver collect.

Determinism: float summation is order-dependent, so partial sums
accumulate as EXACT longs in micro-units (round(x * 1e6)) — the same
convention as lm_score — making the pooled vector bit-stable under any
partitioning (pinned by a pytest) and engine-portable for the oracle.
The ~1e-6 quantization is far below embedding noise; pass a larger
`scale` for more precision if components exceed ~1e12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mean_pool(
    df: DataFrame,
    keys: list[str],
    vec_col: str = "embedding",
    scale: float = 1e6,
) -> DataFrame:
    """Per key: element-wise mean vector and the vector count. Returns
    (keys..., n_vecs, centroid: array<double>). Every vector in a group
    must share one NON-ZERO dimensionality (enforced: ragged dims,
    empty vectors, and NULL vectors all raise — posexplode silently
    emits no rows for empty/NULL arrays, so the per-position counts are
    additionally checked against the group's true ROW count; the
    original min==max check alone let an empty vector vanish from both
    the count and the mean)."""
    pos_val = df.select(
        *[F.col(c) for c in keys],
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    micro = F.round(F.col("val") * scale).cast("long")
    per_pos = pos_val.groupBy(*keys, "pos").agg(
        F.sum(micro).alias("s"), F.count("*").alias("n")
    )
    rows = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_rows"))
    out = per_pos.groupBy(*keys).agg(
        F.min("n").alias("_n_min"),
        F.max("n").alias("_n_max"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("pos"), (F.col("s") / (F.col("n") * scale)).alias("m"))
                )
            ),
            lambda x: F.round(x["m"], 9),
        ).alias("centroid"),
    ).join(rows, keys)
    ok = (F.col("_n_min") == F.col("_n_max")) & (
        F.col("_n_max") == F.col("_rows")
    )
    return out.select(
        *keys,
        F.when(ok, F.col("_rows"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "mean_pool: ragged, empty, or NULL vectors in group: "
                    ),
                    F.concat_ws(",", *[F.col(c).cast("string") for c in keys]),
                )
            )
        )
        .cast("long")
        .alias("n_vecs"),
        "centroid",
    )
