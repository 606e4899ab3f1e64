"""Z-order (Morton) interleaving for multi-dimensional data layout.

Why an engine needs this: parquet data skipping prunes row groups by
per-column min/max ranges, which only works when the file is CLUSTERED
on the filtered column. A corpus queried by two independent dimensions
(user x time, domain x quality-score, lat x lon) cannot be sorted on
both — but it can be sorted on the Z-ORDER key, the bit-interleave of
the two coordinates, which maps 2-D proximity to 1-D proximity. Writing
`repartitionByRange(z).sortWithinPartitions(z)` then gives every file a
tight bounding BOX in both dimensions, so a rectangle predicate prunes
most files on either column (this is exactly what Delta's OPTIMIZE
ZORDER BY does before rewriting files).

The interleave is the classic magic-number bit spread — pure long
shift/mask expressions, whole-stage-codegen friendly, zero Python, and
bit-identical in any engine with 64-bit integer ops (the DuckDB oracle
replays the same five spreads):

    x = (x | x<<8) & 0x00FF00FF; (x | x<<4) & 0x0F0F0F0F;
    (x | x<<2) & 0x33333333;    (x | x<<1) & 0x55555555
    z = spread(x) | spread(y) << 1

Inputs must already be bucketed to [0, 2^16) — rank/quantile/modulo
bucketing is the caller's policy (a layout key needs only ORDER, not
values). The expressions mask to 16 bits defensively.

Scale notes: key computation is a map-side projection; the layout write
itself is `zorder_layout`'s repartitionByRange — one range shuffle (the
same cost as any global sort-for-layout, paid once at write time to
save every future scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits16(x: Column) -> Column:
    """Spread the low 16 bits of a long so bit i lands at position 2i."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key_expr(x: Column, y: Column) -> Column:
    """Morton key of two 16-bit bucket coordinates (long in [0, 2^32)).
    y takes the odd bit positions, x the even ones."""
    return _spread_bits16(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits16(y.cast("long")), 1)
    )


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 64,
    key_name: str = "z_key",
) -> DataFrame:
    """Cluster `df` for 2-D data skipping: add the Morton key of
    (x_col, y_col) (both already bucketed to [0, 2^16)), range-partition
    on it into `n_files` partitions and sort within each. Writing the
    result produces files whose per-file (x, y) bounding boxes tile the
    plane in compact blocks — rectangle predicates on EITHER column
    prune most files via parquet min/max stats (asserted by pytest
    against a 1-D row-order layout on the same data)."""
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    keyed = df.withColumn(
        key_name, zorder_key_expr(F.col(x_col), F.col(y_col))
    )
    return keyed.repartitionByRange(n_files, key_name).sortWithinPartitions(
        key_name
    )
