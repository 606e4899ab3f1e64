"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is rarely trained on whole: pipelines downsample
over-represented strata (by language, source domain, quality band) and
cap the number of documents any single key may contribute. Random
sampling (`df.sample`) is non-reproducible across runs/engines and not
stable under re-partitioning; these operators instead derive a uniform
[0,1) value from a cryptographic hash of the ROW KEY, so

- the same row makes the same keep/drop decision on every engine, every
  run, every partitioning (md5 is bit-identical everywhere);
- sampling is a pure map-side projection — zero shuffle, pushes past
  any scan (the 100 TB property that matters most);
- nested rates compose: sample(0.5) of sample(0.5) with different salts
  is an unbiased 0.25, while re-using one salt is idempotent.

`cap_per_key` is the complementary bounded-contribution operator
(at most k rows per key, deterministic order). It needs one shuffle on
the key; Spark >= 3.5 plans the rank filter as WindowGroupLimit, which
pre-prunes each map partition to its local top-k BEFORE the exchange, so
the shuffle carries O(k x partitions) rows per key, not the key's full
fan-in — the hot-key story is handled by the planner, not by salting.

Reference parity: the reference engine has no sampling tier (it
processes every admitted blob, DocumentProcessor.cs); this extends the
LLM-data-pipeline operator set the same way dedup/textstats do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: fits a signed 64-bit int, and 2^60 divides
# cleanly into a double's 53-bit mantissa scale without bias that
# matters at any realistic rate granularity.
_HASH_BITS = 60
_HASH_HEX = _HASH_BITS // 4
_HASH_DEN = float(1 << _HASH_BITS)


def md5_long(key: Column, salt: str = "") -> Column:
    """THE package-wide deterministic hash: first 60 bits of
    md5(key || salt) as a non-negative long. Engine-portable (md5 hex is
    bit-identical in Spark, DuckDB, Python — oracle SQL twin:
    CAST(concat('0x', substring(md5(k || salt), 1, 15)) AS BIGINT)) and
    salt-composable — independent decisions need distinct salts. Every
    operator needing a portable hash (sampling, packing shards, bloom
    positions, KMV uniforms) derives from this one construction."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, _HASH_HEX),
        16,
        10,
    ).cast("long")


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) draw from a row key: md5_long scaled
    down by 2^60."""
    return md5_long(key, salt) / F.lit(_HASH_DEN)


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep each row iff hash_uniform(key) < rate. Map-side only — the
    filter sits directly on the scan, no shuffle, no RNG state."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(hash_uniform(F.col(key_col), salt) < F.lit(rate))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling: stratum -> rate from a small dict,
    unlisted strata at default_rate. The rate lookup is a literal CASE
    expression (strata sets are small — languages, source domains), so
    the whole operator stays one map-side filter; for a large or dynamic
    rate table, broadcast-join the rates in and filter on the joined
    column instead."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_uniform(F.col(key_col), salt) < rate)


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    order_cols: list[str],
) -> DataFrame:
    """At most k rows per key, keeping the first k in (order_cols, which
    must be a total order per key for determinism — include a unique id).
    Planned as WindowGroupLimit on Spark >= 3.5: each map partition
    pre-prunes to its local top-k before the key shuffle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample_per_key(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of k rows per key:
    Efraimidis-Spirakis exponential-sort — each row draws
    e = -ln(u) / w (u from the deterministic md5 uniform, w > 0 its
    weight) and the k SMALLEST e per key win. Inclusion probability is
    proportional to weight, the draw is reproducible across engines and
    partitionings, and the plan is the same WindowGroupLimit top-k as
    cap_per_key — one shuffle, map-side pre-pruning.

    e is rounded to 9 decimals before ranking (ids break residual ties)
    so rank order is stable under cross-engine floating-point jitter in
    ln(); rows with w <= 0 are excluded (zero weight = never sampled)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    # clamp away u = 0 (probability 2^-60, but ln(0) is engine-dependent)
    u = F.greatest(hash_uniform(F.col(id_col), salt), F.lit(1e-18))
    e = F.round(-F.log(u) / F.col(weight_col), 9)
    w = Window.partitionBy(*key_cols).orderBy(F.col("_e"), F.col(id_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_e", e)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_e", "_rn")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    splits_ppm: dict[str, int] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or any named) split assignment.

    Every row gets a split label derived from md5_long(key) % 1e6
    against cumulative parts-per-million boundaries — pure integer
    math, so the assignment is exactly reproducible on any engine, any
    run, any partitioning, and STABLE UNDER CORPUS GROWTH: a document's
    split never changes when other documents are added or removed
    (the property `df.randomSplit` lacks, and the reason leakage audits
    can trust the label). Distinct salts give independent splits.

    splits_ppm maps label -> parts-per-million; must sum to 1_000_000
    (default 980k/10k/10k train/val/test). Map-side projection only —
    fuses into the scan, zero shuffle.
    """
    if splits_ppm is None:
        splits_ppm = {"train": 980_000, "val": 10_000, "test": 10_000}
    if sum(splits_ppm.values()) != 1_000_000:
        raise ValueError(
            f"splits_ppm must sum to 1_000_000, got {sum(splits_ppm.values())}"
        )
    if any(v < 0 for v in splits_ppm.values()):
        raise ValueError("splits_ppm values must be non-negative")
    bucket = md5_long(F.col(key_col), salt) % F.lit(1_000_000)
    expr = None
    cum = 0
    # deterministic boundary order = insertion order of the dict
    items = list(splits_ppm.items())
    for label, ppm in items[:-1]:
        cum += ppm
        cond = bucket < F.lit(cum)
        expr = (
            F.when(cond, F.lit(label))
            if expr is None
            else expr.when(cond, F.lit(label))
        )
    last_label = items[-1][0]
    expr = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return df.withColumn(out_col, expr)
