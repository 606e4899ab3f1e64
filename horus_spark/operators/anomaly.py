"""Event-rate anomaly detection — the streaming-telemetry health check
(spike/burst detection) every ingestion pipeline runs over its event
log: flag time buckets whose event count jumps a multiple above the
trailing baseline. Crawl pipelines read this over fetch/error events
(a host suddenly 5x-ing its error rate), training pipelines over
ingestion counters (a source doubling overnight usually means a
duplicate feed, not twice the content).

Detection rule (exact integer arithmetic — no float z-scores, which
would be partitioning-sensitive through variance accumulation):

    flagged  <=>  full trailing window
                  AND n_events >= min_count
                  AND n_events * trailing * 1e6 > mult_ppm * trailing_sum

i.e. the bucket's count exceeds (mult_ppm / 1e6) x the trailing-window
MEAN, with an absolute floor so 1-vs-0 noise never fires, and a warmup
guard (buckets without `trailing` full predecessors are never flagged).
The product runs in DECIMAL(38,0) so petabyte-scale counts cannot
overflow.

Shape at scale: composes on time_bucket_rollup's gap-filled aggregate —
the only corpus-sized stage is the rollup's one hash aggregation; the
trailing window runs per key over the BUCKET series (bounded by
extent/width, already guarded by the rollup's max_fill_buckets), and
gap-filling makes the row-based trailing window a true time-based one
(silent hours count as zeros in the baseline, as they must — a burst
after silence IS an anomaly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from horus_spark.operators.rollup import time_bucket_rollup


def rate_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width_s: int = 3600,
    trailing: int = 24,
    mult_ppm: int = 3_000_000,
    min_count: int = 10,
    max_fill_buckets: int = 1_000_000,
) -> DataFrame:
    """Per (key, bucket): event count, trailing-window event sum, and
    the anomaly flag per the module rule. Returns
    (key_col, bucket_start:long epoch-seconds, n_events:long,
    trailing_sum:long — NULL during warmup, flagged:boolean non-null).
    """
    if trailing < 1:
        raise ValueError(f"need trailing >= 1, got {trailing}")
    if mult_ppm <= 1_000_000:
        raise ValueError(
            f"mult_ppm must exceed 1e6 (flagging below the mean is "
            f"noise, not anomaly), got {mult_ppm}"
        )
    if min_count < 1:
        raise ValueError(f"need min_count >= 1, got {min_count}")
    roll = time_bucket_rollup(
        events.withColumn("_zero", F.lit(0.0)),
        ts_col=ts_col,
        key_col=key_col,
        value_col="_zero",
        width_s=width_s,
        gap_fill=True,
        locf=False,
        max_fill_buckets=max_fill_buckets,
    ).select(
        F.col(key_col).alias("k"), "bucket_start", "n_events"
    )
    w = (
        Window.partitionBy("k")
        .orderBy("bucket_start")
        .rowsBetween(-trailing, -1)
    )
    with_base = roll.select(
        "k",
        "bucket_start",
        "n_events",
        F.sum("n_events").over(w).alias("_tsum"),
        F.count("n_events").over(w).alias("_tn"),
    )
    full = F.col("_tn") == trailing
    exceeds = F.expr(
        f"CAST(n_events AS DECIMAL(38,0)) * {int(trailing)} * 1000000"
        f" > CAST({int(mult_ppm)} AS DECIMAL(38,0)) * _tsum"
    )
    return with_base.select(
        F.col("k").alias(key_col),
        "bucket_start",
        F.col("n_events").cast("long").alias("n_events"),
        F.when(full, F.col("_tsum").cast("long")).alias("trailing_sum"),
        (full & (F.col("n_events") >= min_count) & exceeds).alias(
            "flagged"
        ),
    )
