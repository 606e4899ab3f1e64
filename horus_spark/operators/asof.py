"""As-of (point-in-time) join: for every left row, the single latest
right row at-or-before its timestamp, per key.

The naive formulations all fail at 100 TB:
- correlated subquery / per-row MAX: not expressible as one pass;
- inequality join then window top-1: Spark plans `l.key = r.key AND
  l.ts >= r.ts` as a hash join on key whose output EXPLODES to
  O(|matches per key|^2) rows before the window prunes them;
- broadcast right side: only if the right side is small.

The at-scale shape (used here) is the UNION-AND-CARRY pattern:
tag both inputs, union them (a columnar concat, no join), then one
window per key ordered by time carries the most recent right-side
payload forward onto every left row — `last(payload, ignorenulls=True)`
over rowsBetween(unboundedPreceding, currentRow). Cost: exactly ONE
shuffle of |left| + |right| rows on the key, no intermediate blow-up,
and AQE handles skewed keys like any other window.

Tie semantics: a right row at exactly the left row's timestamp MATCHES
(inclusive, DuckDB `ASOF JOIN ... ON l.ts >= r.ts` semantics) — the
union sorts right rows before left rows at equal timestamps. Multiple
right rows at the same (key, ts) are resolved by taking the greatest
carried payload struct — field order (right ts, then right_cols in
declaration order) defines the comparison — so results stay
deterministic; reorder right_cols if a different column should break
ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance=None,
) -> DataFrame:
    """Left as-of-backward join: every `left` row gains `prefix`-named
    copies of `right_cols` (default: all non-key, non-ts right columns)
    plus `{prefix}{right_ts}`, from the latest right row with
    right_ts <= left_ts on the same `on` key — or NULLs if none.

    `tolerance` (e.g. `F.expr("INTERVAL 10 MINUTES")` or a numeric
    delta) additionally requires right_ts >= left_ts - tolerance,
    matching pandas.merge_asof semantics."""
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # right rows sort before left rows at equal _t (inclusive match);
    # among right rows at equal (key, _t) the LAST payload in _payload
    # order wins — order by the payload struct itself (field order puts
    # _ts first, then right_cols as the deterministic tie-break).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m._ts") >= F.col("_t") - tolerance, F.col("_m")
            ),
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col("_m._ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
