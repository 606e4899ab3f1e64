"""Incremental view maintenance (IVM) over the snapshot catalog.

A 100 TB table's derived aggregates (per-host page counts, per-customer
revenue, per-source token mass) cannot be recomputed from scratch every
time a batch lands — the warehouse answer is incremental view
maintenance: fold the CHANGELOG into the materialized state, paying
O(changed data) instead of O(table). This module is that fold for the
self-maintainable aggregate family (COUNT / SUM, with AVG derived at
read time), driven by `sources.sink.snapshot_diff`'s net row-level
changelog (which itself reads only the chunks that differ between two
snapshots — see sink.py:692).

The algebra (classic delta-propagation, e.g. Gupta & Mumick's
materialized-view survey): every changelog row carries sign +1
(insert) / -1 (delete); the delta-aggregate per group is
sum(sign) rows and sum(value * sign) per SUM column; applying it is a
group-wise addition onto the state, and groups whose maintained row
count reaches zero are DELETED from the view (count going negative
means the state and changelog are out of step — raised, not hidden).
MIN/MAX are not self-maintainable under deletes (a retracted minimum
needs a rescan of its group) and are deliberately not offered — the
`sums` spec only expresses the SUM family.

Scale shape: one hash aggregate over the (already chunk-pruned)
changelog + one hash aggregate merging state: both shuffles carry only
(keys, counters) — never table rows. The state is a first-class
DataFrame the caller persists wherever it likes (the snapshot catalog
itself via append_chunk, parquet, memory for tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROWS = "n_rows"


def delta_aggregate(
    delta: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    change_col: str = "change_type",
) -> DataFrame:
    """Signed partial aggregate of a changelog frame: (keys...,
    <alias> = SUM(col * sign) per `sums` entry, n_rows = SUM(sign)).
    `sums` maps output alias -> source column. Inserts count +1,
    deletes -1; any other change_type value raises in-plan (a malformed
    changelog must not silently skew the view)."""
    if _ROWS in sums:
        raise ValueError(f"alias {_ROWS!r} is reserved for the row counter")
    sign = (
        F.when(F.col(change_col) == "insert", F.lit(1))
        .when(F.col(change_col) == "delete", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("ivm: unknown change_type "), F.col(change_col)
                )
            ).cast("int")
        )
    )
    aggs = [
        F.sum(F.col(src) * sign).alias(alias) for alias, src in sums.items()
    ]
    aggs.append(F.sum(sign).cast("long").alias(_ROWS))
    return delta.groupBy(*keys).agg(*aggs)


def apply_delta(
    state: DataFrame | None,
    delta_agg: DataFrame,
    keys: list[str],
    sum_aliases: list[str],
) -> DataFrame:
    """Fold a delta-aggregate into the view state (both on the schema
    delta_aggregate emits). Pass state=None to bootstrap from the first
    delta. Groups whose maintained row count reaches 0 vanish; a
    negative count raises at evaluation time — the changelog being
    applied does not belong to this state's snapshot lineage."""
    merged = delta_agg if state is None else state.unionByName(delta_agg)
    out = merged.groupBy(*keys).agg(
        *[F.sum(a).alias(a) for a in sum_aliases],
        F.sum(_ROWS).cast("long").alias(_ROWS),
    )
    bad = F.raise_error(
        F.concat(
            F.lit("ivm: negative row count for group; state/changelog "
                  "snapshot mismatch ("),
            F.col(_ROWS).cast("string"),
            F.lit(")"),
        )
    ).cast("long")
    return out.withColumn(
        _ROWS, F.when(F.col(_ROWS) < 0, bad).otherwise(F.col(_ROWS))
    ).filter(F.col(_ROWS) > 0)


def maintain_view(
    spark,
    out_dir: str,
    table: str,
    keys: list[str],
    sums: dict[str, str],
    state: DataFrame | None,
    from_snapshot: int,
    to_snapshot: int,
) -> DataFrame:
    """Advance a materialized COUNT/SUM view of `table` from
    `from_snapshot` to `to_snapshot` by folding the catalog changelog
    into `state` (None bootstraps — use from_snapshot=0 semantics by
    diffing from the earliest retained snapshot's predecessor is not
    supported; bootstrap by folding from the first retained snapshot's
    own diff or aggregate it directly). Only chunks that changed
    between the two snapshots are scanned."""
    from horus_spark.sources.sink import snapshot_diff

    delta = snapshot_diff(spark, out_dir, table, from_snapshot, to_snapshot)
    return apply_delta(
        state, delta_aggregate(delta, keys, sums), keys, list(sums)
    )


def view_from_table(
    df: DataFrame, keys: list[str], sums: dict[str, str]
) -> DataFrame:
    """Full recompute on the view schema — the bootstrap path and the
    parity check IVM is audited against."""
    return df.groupBy(*keys).agg(
        *[F.sum(F.col(src)).alias(a) for a, src in sums.items()],
        F.count(F.lit(1)).cast("long").alias(_ROWS),
    )
