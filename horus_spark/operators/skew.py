"""Skew-handling operators.

The pipeline's primary skew controls live where they belong — row-level
doc_id hash repartitioning plus the kernel's bounded per-doc cost
(pipeline.py), hot-shingle pruning in dedup (dedup.py), AQE skew-join for
ad-hoc queries (session.py) — but a general SALTED JOIN is the explicit
tool for joining a fact table whose join key is pathologically hot against
a dimension too large to broadcast (the north rule's "explicit
salting/repartitioning for skewed media-heavy documents").

Mechanics: every fact row gets a salt in [0, n_salts); the dimension side
is replicated once per salt value; the equi-join runs on (key, salt), so
one hot key's rows spread across n_salts shuffle partitions instead of
one straggler. The salt never appears in the output and cannot change the
join result — only the partitioning of the work. That transparency only
holds for join modes whose unmatched rows come from the fact side, so
right/full outer modes are rejected (see _SAFE_HOW).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

# Join modes for which salting is result-preserving. The dim side is
# REPLICATED n_salts times, so any mode that can emit unmatched DIM rows
# (right/full outer) would emit each unmatched dim key n_salts times —
# salting is only transparent when unmatched output rows come exclusively
# from the fact side (or no unmatched rows at all).
_SAFE_HOW = {
    "inner", "cross",
    "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti",
}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | None = None,
    n_salts: int = 16,
    how: str = "inner",
    on_left: str | None = None,
    on_right: str | None = None,
) -> DataFrame:
    """Equi-join `fact` (skewed key side) with `dim` (replicated side) on
    column `on` (same name both sides) or on_left/on_right (differing
    names; the right key column is dropped from the output like a plain
    `fact.join(dim, fact.k == dim.k)` would keep both — here the salt
    machinery owns the condition, so the duplicate key is dropped),
    salted across n_salts sub-keys.

    Cost model: dim is shuffled n_salts times (replication) so pick
    n_salts ~ (hottest key's row count / target partition rows); fact
    rows are shuffled once, same as a plain join. Use ONLY when a hot
    key actually exists — a plain join is cheaper otherwise, and AQE's
    skewedJoin handles moderate skew without replication."""
    if how.lower().replace(" ", "") not in _SAFE_HOW:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated dim "
            "side would emit each unmatched dim key n_salts times under "
            "right/full outer joins. Supported: inner, cross, left(_outer), "
            "left_semi, left_anti. For a skewed right/full outer join, "
            "swap the sides or rely on AQE skew-join handling."
        )
    if SALT_COL in fact.columns or SALT_COL in dim.columns:
        raise ValueError(f"{SALT_COL} column already present")
    if on is not None:
        on_left = on_right = on
    if on_left is None or on_right is None:
        raise ValueError("pass `on` or both on_left/on_right")
    # distribution-only value: spreading rows of one hot key is the whole
    # point, so ANY per-row value works; id() is cheap and shuffle-free
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (salted_fact[on_left] == replicated_dim[on_right]) & (
        salted_fact[SALT_COL] == replicated_dim[SALT_COL]
    )
    # drop the dim-side key + both salt columns: output shape matches the
    # plain list-form join (one key column, from the fact side)
    return (
        salted_fact.join(replicated_dim, cond, how)
        .drop(replicated_dim[on_right])
        .drop(replicated_dim[SALT_COL])
        .drop(SALT_COL)
    )
