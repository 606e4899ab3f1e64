"""Global row numbering without the single-task sort bottleneck.

Training-data pipelines need stable global positions: shard boundaries
("rows 0..10M -> shard 0"), resumable cursors, deterministic
interleaving of packed sequences. The naive Spark spelling —
`row_number().over(Window.orderBy(key))` — has an EMPTY window
partition spec, so Spark moves the ENTIRE dataset into one task to
number it (it even warns about it). At 100 TB that is not slow, it is
impossible.

The scalable shape — two-level numbering over VALUE-DETERMINISTIC
buckets:

1. bucket assignment: uniform splits of the leading key's [min, max]
   extent — a map-side projection against a broadcast 1-row aggregate.
   Crucially the bucket is a PURE FUNCTION OF THE KEY VALUE, so every
   consumer of the frame computes identical buckets by construction.
   (A first draft derived partition ids from `repartitionByRange` +
   `monotonically_increasing_id`; that is correct ONLY if both
   consumers share one physical shuffle, and Spark's range partitioner
   seeds its boundary sampling with the RDD id — column pruning made
   the two subtrees non-identical, ReusedExchange didn't fire, and the
   two independent shuffles drew DIFFERENT boundaries: silent wrong
   numbering, caught by the sf0.01 oracle. Value-determined buckets
   make consumer agreement unconditional.)
2. per-bucket counts: map-side partial aggregate; the exchange carries
   one row per bucket.
3. offsets: cumulative sum over the TINY counts frame (buckets ascend
   with the key, so earlier buckets' counts sum to the offset),
   broadcast-joined back.
4. local rank: row_number over Window.partitionBy(bucket) — ONE corpus
   hash shuffle on the bucket id, each bucket numbering itself in
   parallel. global = offset + local.

Total corpus movement: one hash shuffle + per-bucket sorts. The extent
and count aggregates are column-pruned scans of the leading key only.

Bucketing by uniform extent splits assumes the leading key is roughly
uniform (ids, hashes, epochs — the usual numbering keys); a skewed key
degrades PARALLELISM, never correctness (ties always share a bucket,
and the window orders within it). Raise n_parts or pre-transform the
key for pathological distributions.

Determinism contract: `order_cols` must uniquely key the rows (pass a
tie-breaker column otherwise) and the leading column must be non-null
numeric.

Reference parity note: the reference assigns per-document sequence via
its SQL IDENTITY columns (HorusSql.cs table definitions); this is the
distributed equivalent for corpus-scale numbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_num",
    n_parts: int | None = None,
    start: int = 1,
) -> DataFrame:
    """Add a global row number (first row = `start`) in the total order
    of `order_cols` (which must uniquely key the rows; the leading
    column must be non-null numeric). Fully lazy — no driver collect;
    the extent and offsets ride broadcast joins."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    spark = df.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    lead = F.col(order_cols[0]).cast("double")
    extent = df.agg(
        F.min(lead).alias("_lo"), F.max(lead).alias("_hi")
    )

    # monotone, value-determined bucket in [0, n_parts). A NULL leading
    # key would bucket to NULL and silently VANISH in the offsets join —
    # fail loudly instead (the row has no place in a total order).
    span = F.col("_hi") - F.col("_lo")
    bucket = (
        F.when(
            lead.isNull(),
            F.raise_error(
                F.lit(
                    f"global_row_number: leading order column "
                    f"'{order_cols[0]}' contains NULLs — a NULL has no "
                    "position in the total order; filter or coalesce "
                    "upstream"
                )
            ).cast("int"),
        )
        .when(span <= F.lit(0.0), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_parts - 1),
                F.floor((lead - F.col("_lo")) / span * F.lit(n_parts)),
            )
        )
        .cast("int")
    )
    tagged = df.crossJoin(F.broadcast(extent)).withColumn("_bucket", bucket)

    counts = tagged.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "_bucket", (F.sum("_n").over(w_off) - F.col("_n")).alias("_offset")
    )

    w_local = Window.partitionBy("_bucket").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        tagged.withColumn("_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn(
            out_col,
            (F.col("_offset") + F.col("_local") + F.lit(start - 1)).cast(
                "long"
            ),
        )
        .drop("_bucket", "_local", "_offset", "_lo", "_hi")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    out_col: str = "shuffle_pos",
    n_parts: int | None = None,
) -> DataFrame:
    """Deterministic per-epoch corpus permutation: every row gets its
    position in epoch `epoch`'s shuffle order, computed as the global
    row number over (md5(id || epoch-salt), id).

    This is how a training pipeline shuffles 100 TB: not by sorting on
    an RNG draw (non-reproducible, not resumable), but by a hash order
    that is a pure function of (row identity, epoch) — any worker can
    recompute any row's position, a crashed epoch resumes mid-stream,
    and different epochs give independent permutations (distinct salts).
    The md5-derived key is uniform by construction, which is exactly the
    leading-key distribution `global_row_number`'s extent bucketing
    wants — the composition inherits its one-corpus-shuffle plan.

    The id column must uniquely key the rows (it is also the tie-break,
    so even a 60-bit hash collision cannot make the order ambiguous).
    """
    from horus_spark.operators.sampling import md5_long

    keyed = df.withColumn(
        "_shuffle_key", md5_long(F.col(id_col), f"epoch{int(epoch)}")
    )
    return global_row_number(
        keyed, ["_shuffle_key", id_col], out_col=out_col, n_parts=n_parts
    ).drop("_shuffle_key")


def curriculum_order(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
    n_stages: int = 4,
    epoch: int = 1,
    out_col: str = "curriculum_pos",
) -> DataFrame:
    """Curriculum training order (Bengio et al. 2009 made
    corpus-native): rows are banded into `n_stages` difficulty stages
    by their PER-GROUP score percentile (priors.percentile_normalize —
    so 'easy' is calibrated within each domain, not dominated by
    whichever source scores high globally), and the epoch's training
    order is (stage ASC, deterministic per-epoch shuffle within the
    stage):

      stage          = least(pct_ppm * n_stages div 1e6, n_stages-1)
                       (stage 0 = lowest score; pass a
                       difficulty-ascending score for easy-first)
      curriculum_pos = global row number over
                       (stage, md5(id || epoch-salt), id)

    Reproducible/resumable for the same reasons as epoch_shuffle (a
    pure function of row identity + epoch), while guaranteeing every
    stage-k row precedes every stage-k+1 row. Returns the input's
    (id, group, score, pct_ppm) plus stage and `out_col` (1-based).

    Scale shape: one group-keyed window (the percentile), then the
    one-corpus-shuffle global numbering — the q72/q74 machinery with a
    composite leading key."""
    if n_stages < 1:
        raise ValueError("n_stages must be >= 1")
    from horus_spark.operators.priors import percentile_normalize
    from horus_spark.operators.sampling import md5_long

    pct = percentile_normalize(df, score_col, group_col, id_col=id_col)
    staged = pct.withColumn(
        "stage",
        F.expr(
            f"CAST(least(pct_ppm * {n_stages}"
            f" div CAST(1000000 AS BIGINT), {n_stages - 1}) AS INT)"
        ),
    ).withColumn(
        "_shuffle_key", md5_long(F.col("id"), f"epoch{int(epoch)}")
    )
    return global_row_number(
        staged, ["stage", "_shuffle_key", "id"], out_col=out_col
    ).drop("_shuffle_key")
