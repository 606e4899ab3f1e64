"""Funnel analysis over event streams: ordered step completion per user
within a time window, as ONE per-user aggregation + a zero-shuffle fold.

The product-analytics primitive behind conversion reporting (signup ->
view -> purchase): for each user, how deep into an ordered sequence of
step types did they get, where step k must occur strictly after step
k-1 (total order: (timestamp, event_id)) and every step after the first
must land within `window_s` seconds of the FIRST step (the anchor).

Semantics — earliest-anchor greedy, the standard funnel default:
- the anchor is the user's FIRST step-1 event (earliest (ts, event_id));
- each subsequent step is matched greedily to the earliest qualifying
  event after the previous match and within the anchor window;
- events of types outside the funnel are ignored; a later step type
  occurring before its turn does not count (order is strict).

Determinism: matching folds over the user's events sorted by
(unix_micros(ts), event_id) — a total order — so the result is a pure
function of the data, independent of partitioning, and a SQL oracle can
replay it as a chain of per-step earliest-match joins.

Scale shape: the event stream is filtered to funnel-step types map-side
(at web scale this drops most of the input before any wire transfer),
then ONE hash shuffle groups by user with collect_list partial
aggregation; the fold itself is a per-user `F.aggregate` over the
sorted event array — no window over the raw stream, no per-step join,
no driver participation. Per-user state is one small struct, so a user
with millions of events costs one array sort (cap/bucket pathological
users upstream with `sampling.cap_per_key` if the corpus has them).

Reference parity: the reference engine has no event-funnel stage; this
extends the events-table analytics tier next to sessionization (q09)
and transition mining (q133).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    window_s: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user funnel depth for the ordered `steps` types.

    Returns one row per user that has at least one event of any step
    type: (user_id, n_steps int, completed boolean, anchor_us long,
    last_us long) — anchor_us is the micros timestamp of the matched
    step-1 event (NULL when the user never performed step 1), last_us
    the timestamp of the deepest matched step (= anchor_us at depth 1).
    """
    k = len(steps)
    if k < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {k}")
    if len(set(steps)) != k:
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    if window_s <= 0:
        raise ValueError(f"window_s must be positive, got {window_s}")
    win_us = int(window_s) * 1_000_000

    step_idx = F.lit(None).cast("int")
    for i in reversed(range(k)):
        step_idx = F.when(F.col(type_col) == steps[i], F.lit(i)).otherwise(step_idx)

    ev = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("user_id"),
            F.struct(
                # TIMESTAMP_NTZ parquet columns cast through TIMESTAMP in
                # the session zone (UTC per horus_spark.session), matching
                # DuckDB's epoch_us over naive timestamps.
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
                F.col(id_col).cast("long").alias("eid"),
                step_idx.alias("idx"),
            ).alias("e"),
        )
    )
    grouped = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("e")).alias("evs")
    )
    # fold state: (n matched, anchor micros, last micros); -1 = unset —
    # keeps the state struct null-free so the fold stays a pure
    # expression (nullable struct fields break type unification in
    # F.when branches on some engines).
    init = F.struct(
        F.lit(0).cast("int").alias("n"),
        F.lit(-1).cast("long").alias("anchor"),
        F.lit(-1).cast("long").alias("last"),
    )
    state = F.aggregate(
        F.col("evs"),
        init,
        lambda acc, e: F.when(
            (acc["n"] < F.lit(k))
            & (e["idx"] == acc["n"])
            & ((acc["n"] == 0) | (e["us"] <= acc["anchor"] + F.lit(win_us))),
            F.struct(
                (acc["n"] + 1).cast("int").alias("n"),
                F.when(acc["n"] == 0, e["us"]).otherwise(acc["anchor"]).alias("anchor"),
                e["us"].alias("last"),
            ),
        ).otherwise(acc),
    )
    return grouped.select(
        "user_id",
        state["n"].alias("n_steps"),
        (state["n"] == k).alias("completed"),
        F.when(state["anchor"] >= 0, state["anchor"]).alias("anchor_us"),
        F.when(state["last"] >= 0, state["last"]).alias("last_us"),
    )


def funnel_summary(per_user: DataFrame) -> DataFrame:
    """Conversion table from `funnel` output: users reaching AT LEAST
    each depth d (the cumulative funnel bar chart). One tiny hash agg;
    depth 0 rows (users with step-type events but no step-1 match)
    still count toward n_users at depth 0."""
    by_depth = per_user.groupBy(F.col("n_steps").alias("depth")).agg(
        F.count(F.lit(1)).alias("n_at_depth")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("depth")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return by_depth.select(
        "depth",
        F.sum("n_at_depth").over(w).cast("long").alias("n_reached"),
    )
