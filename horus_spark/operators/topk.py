"""Group-wise top-k selection — keep the best k rows per key (best-k
documents per domain by quality score, best-k candidates per query,
newest-k versions per file). The per-key analog of TakeOrdered.

Shape at scale: a row_number window filtered to <= k is planned by
Spark as WindowGroupLimit (3.5+): every partition keeps only its local
top-k per key BEFORE the exchange, so the shuffle carries at most
(partitions x k) rows per key instead of the whole group — the same
map-side pruning TakeOrderedAndProject does globally. A pytest asserts
the WindowGroupLimit node is present so a regression back to a full
window sort is caught.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_col: str | None = None,
) -> DataFrame:
    """Top-k rows per key by `order_col`, deterministic via `tie_col`
    (ascending) as the secondary sort. Output = input columns + `rank`
    (1-based). tie_col=None is allowed only when (keys, order_col) is
    known unique — otherwise results are nondeterministic under ties."""
    if k < 1:
        raise ValueError("k must be >= 1")
    order: list[Column] = [
        F.desc(order_col) if descending else F.asc(order_col)
    ]
    if tie_col is not None:
        order.append(F.asc(tie_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
