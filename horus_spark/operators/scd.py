"""Slowly-changing-dimension history from event streams: collapse a
per-key timeline of observed states into SCD-type-2 validity intervals
(the gaps-and-islands pattern).

Given (key, ts, state) observations, emit one row per RUN of equal
consecutive states per key with [valid_from, valid_to) validity and an
is_current flag — the standard warehouse shape for "what was this
entity's state at time T" point-in-time joins (composes directly with
asof.py's as-of join on valid_from).

Algorithm (two windows + one aggregation, all partitioned by key — the
textbook islands construction):
 1. change marker: state != lag(state) over (key ORDER BY ts, tiebreak)
 2. island id: running SUM of markers over the same window — pure
    per-key sequential scan, no self-join, no explode.
 3. per (key, island): valid_from = min(ts), last_ts = max(ts),
    n_observations; valid_to = lead(valid_from) over (key ORDER BY
    island) — half-open intervals, NULL on the open current row.

Shape at scale: ONE shuffle on key (all three window functions and the
aggregation share the same partitioning, so Catalyst plans a single
Exchange and chains the Windows over one sort). Per-key history fits a
partition by assumption (dimension semantics: keys are entities, not
the fact stream); for a pathological hot key, pre-aggregate
observations to distinct (key, ts) first.

Determinism: ties on ts are broken by `tiebreak_col` (required — the
lag/lead pair must see ONE total order or the island boundaries are
partitioning-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD2 validity intervals per key from raw state observations.

    Returns (key_cols..., state, valid_from, valid_to, is_current,
    n_observations) — valid_to is the NEXT run's valid_from (half-open
    interval), NULL on each key's current (last) run. Consecutive equal
    states collapse into one row; a state that recurs after an
    intervening different state starts a NEW row (history, not a
    distinct list). NULL states are legal and compared with
    null-safe equality (a NULL->NULL repeat does not open a new run).
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_seq = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.when(
        F.lag(state_col).over(w_seq).eqNullSafe(F.col(state_col)), F.lit(0)
    ).otherwise(F.lit(1))
    runs = df.select(
        *key_cols, ts_col, state_col, tiebreak_col
    ).withColumn("_island", F.sum(changed).over(w_seq))
    agg = runs.groupBy(*key_cols, "_island", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_observations"),
    )
    w_isl = Window.partitionBy(*key_cols).orderBy(F.col("_island").asc())
    return agg.select(
        *key_cols,
        F.col(state_col).alias("state"),
        "valid_from",
        F.lead("valid_from").over(w_isl).alias("valid_to"),
        F.lead("valid_from").over(w_isl).isNull().alias("is_current"),
        "n_observations",
    )
