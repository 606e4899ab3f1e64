"""Interval (range) join: left point-in-time rows matched to right rows
whose [start, end] interval contains them, per key.

Spark plans a raw `l.key = r.key AND l.ts BETWEEN r.start AND r.end`
as a hash join on key followed by a per-key-pair filter — fine until one
key is hot, catastrophic when there is no equi-key at all (then it's a
BroadcastNestedLoopJoin scanning |left| x |right|). The at-scale shape
(used here, same as Databricks' range-join optimization and Flink's
interval join) is BUCKETIZATION:

- pick a bucket width ~ the typical interval length;
- each right interval explodes into the buckets it covers
  (ceil(len/width) + 1 rows — bounded replication, known up front);
- each left point lands in exactly ONE bucket;
- equi-join on (key, bucket), then the exact BETWEEN filter.

Because the left side has a single bucket per row, every qualifying
(left, right) pair meets in exactly one bucket — no post-join dedup.
The join becomes an ordinary hash equi-join whose keys spread time-wise
across the cluster; shuffle volume is |left| + |right| x replication.

Width trade-off: too small -> right replication grows; too large ->
many same-bucket non-matches reach the exact filter. Both ends are
visible in the two terms of the cost model above; width ~ median
interval length is within ~2x of optimal for realistic skews.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_width_s: float,
    how: str = "inner",
) -> DataFrame:
    """Join each `left` row to every `right` row with the same `on` key
    whose [right_start, right_end] interval contains left_ts
    (inclusive bounds, SQL BETWEEN semantics). Timestamps are compared
    at microsecond precision. Output: all left columns plus right's
    non-key columns (caller renames clashes upfront; the join raises on
    ambiguous names). `how` supports inner / left_semi / left_anti
    (the containment variants that need no unmatched-row handling)."""
    if bucket_width_s <= 0:
        raise ValueError(f"bucket_width_s must be > 0, got {bucket_width_s}")
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(f"unsupported how={how!r}")
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(f"rename clashing non-key columns first: {sorted(clash)}")
    w_us = int(bucket_width_s * 1_000_000)
    if w_us < 1:
        # sub-microsecond widths truncate to 0 and the bucket floor
        # would divide by zero (NULL buckets -> silently empty join)
        raise ValueError(
            f"bucket_width_s={bucket_width_s} is below 1 microsecond"
        )

    def _bucket(c: str):
        # cast normalizes TIMESTAMP_NTZ -> TIMESTAMP (unix_micros only
        # accepts the latter); any non-decreasing mapping is correct here
        # because bucketing is a pure pre-filter — the exact BETWEEN on
        # the ORIGINAL columns decides membership.
        return F.floor(F.unix_micros(F.col(c).cast("timestamp")) / w_us)

    li = left.withColumn("_bucket", _bucket(left_ts)).alias("l")
    ri = (
        right.withColumn(
            "_bucket",
            F.explode(F.sequence(_bucket(right_start), _bucket(right_end))),
        )
    ).alias("r")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on]
    cond.append(F.col("l._bucket") == F.col("r._bucket"))
    cond.append(F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}"))
    cond.append(F.col(f"l.{left_ts}") <= F.col(f"r.{right_end}"))
    joined = li.join(ri, cond, how)
    if how in ("left_semi", "left_anti"):
        return joined.drop("_bucket")
    right_payload = [c for c in right.columns if c not in on]
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right_payload],
    )
