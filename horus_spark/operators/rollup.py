"""Time-bucket rollup with gap-fill and LOCF — the hypertable
continuous-aggregate shape (TimescaleDB's time_bucket_gapfill /
locf) re-expressed as pure Spark relational algebra.

Pipeline shape:

1. bucket assignment is integer epoch math fused into the scan
   (`(unix_timestamp(ts) div width) * width` — a map-side projection),
2. ONE hash aggregation per (key, bucket) with map-side partial
   combine; the value sum is accumulated as EXACT micro-int longs
   (round(value * 1e6), the same order-deterministic convention as
   pooling.py / lm_score.py) so the result is bit-identical across
   partitionings and engines,
3. gap-fill joins the aggregate against a DIMENSION frame built from
   two tiny aggregates (global bucket extent x distinct keys) — a
   `sequence()` explode over the extent, broadcast to the fact side.
   No corpus rows are exploded; the dimension is O(keys x buckets),
4. LOCF (last observation carried forward) is a single
   `last(ignorenulls)` running window per key, ordered by bucket —
   Spark plans it as one window over the already-aggregated frame.

Scale notes (100 TB direction): the only corpus-sized stage is step 2,
whose shuffle carries (key, bucket, count, sum) partials after map-side
combine — the cardinality of the ROLLUP, not the events. The gap-fill
dimension must be bounded: with wide extents and fine widths,
keys x buckets can itself explode; `max_fill_buckets` guards against a
runaway `sequence()` (the same failure TimescaleDB guards with its
gapfill limit).

Reference parity note: the reference engine has no time-series stage;
this covers the "hypertable rollup" operator class from the
LLM-data-pipeline tier (events telemetry: per-type hourly health
rollups that tolerate silent hours).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def time_bucket_expr(ts_col: str, width_s: int) -> F.Column:
    """Bucket start (epoch seconds, long) for a timestamp column:
    floor(epoch / width) * width. Integer division on the epoch long —
    exact and engine-portable (epochs here are non-negative, so
    truncating and flooring division agree)."""
    return (
        F.expr(f"unix_timestamp(`{ts_col}`) div {int(width_s)}")
        * F.lit(width_s)
    ).cast("long")


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width_s: int = 3600,
    gap_fill: bool = True,
    locf: bool = True,
    max_fill_buckets: int = 1_000_000,
) -> DataFrame:
    """Per (key, bucket): event count and exact value sum; optionally
    gap-filled to the full global bucket extent per key, with the value
    sum carried forward over silent buckets (LOCF).

    Output: (key_col, bucket_start, n_events, value_sum, value_filled)
    - bucket_start: epoch seconds (long), inclusive bucket start
    - n_events: 0 for gap-filled buckets
    - value_sum: NULL for gap-filled buckets (no observation)
    - value_filled: value_sum with LOCF applied (NULL until the key's
      first observed bucket); equals value_sum when locf=False
    """
    if width_s < 1:
        raise ValueError(f"width_s must be >= 1, got {width_s}")
    base = df.select(
        F.col(key_col).alias("k"),
        time_bucket_expr(ts_col, width_s).alias("bucket_start"),
        F.round(F.col(value_col) * MICRO).cast("long").alias("_vm"),
    ).filter(F.col("bucket_start").isNotNull())

    agg = base.groupBy("k", "bucket_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_vm").alias("_sm"),
    )

    if gap_fill:
        span = base.agg(
            F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
        )
        # runaway-dimension guard, evaluated LAZILY inside the sequence
        # bound (no eager job at construction — the dedup_pipeline
        # lesson): the error branch replaces the lower bound when the
        # extent is insane, so the check rides the plan and fails the
        # job with a diagnosable message instead of sequence()'s opaque
        # array-size error. (A no-op when(c, x).otherwise(x) wrapper
        # would be simplified away by Catalyst — the branches must
        # genuinely differ.)
        n_buckets = (
            F.expr(f"(_hi - _lo) div {int(width_s)}") + F.lit(1)
        ).cast("long")
        lo_guarded = (
            F.when(
                n_buckets > F.lit(max_fill_buckets),
                F.raise_error(
                    F.concat(
                        F.lit("gap-fill would generate "),
                        n_buckets.cast("string"),
                        F.lit(
                            f" buckets per key (> max_fill_buckets="
                            f"{max_fill_buckets}); widen width_s or "
                            "disable gap_fill"
                        ),
                    )
                ).cast("long"),
            )
            .otherwise(F.col("_lo"))
        )
        dims = (
            base.select("k")
            .distinct()
            .crossJoin(F.broadcast(span))
            .select(
                "k",
                F.explode(
                    F.sequence(lo_guarded, F.col("_hi"), F.lit(width_s))
                ).alias("bucket_start"),
            )
        )
        agg = dims.join(agg, ["k", "bucket_start"], "left").select(
            "k",
            "bucket_start",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.col("_sm"),
        )

    if locf:
        w = (
            Window.partitionBy("k")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last("_sm", ignorenulls=True).over(w)
    else:
        filled = F.col("_sm")

    return agg.select(
        F.col("k").alias(key_col),
        "bucket_start",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("_sm") / MICRO, 6).alias("value_sum"),
        F.round(filled / MICRO, 6).alias("value_filled"),
    )
