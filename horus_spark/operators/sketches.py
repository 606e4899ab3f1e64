"""Distinct-count sketching: KMV (k-minimum-values) over md5 uniforms.

The production Spark answer for approximate COUNT(DISTINCT) is the
built-in `approx_count_distinct` (HyperLogLog++, constant state, one
pass) — exposed here as `approx_distinct` for completeness. Its
estimates are engine-specific, so it cannot be oracle-matched against
DuckDB; `kmv_distinct` is the deterministic sibling built on the same
md5-uniform construction the sampling operators use: both engines see
identical hashes, identical k-th minima, identical estimates.

KMV recap (Bar-Yossef et al. 2002): hash every value to a uniform in
(0, 1]; keep the k smallest DISTINCT hashes; if fewer than k distinct
values exist the sketch is exact, otherwise estimate n ~= (k-1)/h_(k).

Shape at scale (the 100 TB direction):
- stage 1 is an Arrow-batched mapInPandas kernel that keeps, per input
  batch and group, only the k smallest distinct hashes — bounded state,
  zero shuffle. Correctness of the cut is the KMV merge property: every
  one of the global k smallest distinct hashes is within its own
  batch's k smallest, so pruning the rest cannot change the result —
  which also makes the operator PARTITIONING-INVARIANT (repartition the
  input any way you like, same answer; pinned by a pytest).
- stage 2 shuffles at most (n_batches x k) rows per group — not the
  corpus — then resolves the global k minima with array expressions.

Compare the naive exact shape (groupBy(group, value).distinct) whose
shuffle carries every distinct value: KMV's shuffle is O(batches x k)
regardless of cardinality.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.sampling import _HASH_DEN, md5_long


def _uniform_expr(value: F.Column, salt: str) -> F.Column:
    # (h+1)/2^60 in (0, 1] — strictly positive so (k-1)/h_k never
    # divides by zero; same md5_long construction as every operator
    return (md5_long(value, salt).cast("double") + F.lit(1.0)) / F.lit(_HASH_DEN)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    salt: str = "",
) -> DataFrame:
    """Per group: the KMV sketch itself — (group_cols...,
    mins: array<double>, the <= k smallest distinct md5-uniform hashes,
    ascending). The mergeable form: sketches of two tables union by
    re-cutting the combined arrays to k (kmv_set_ops), which by the
    KMV merge property equals the sketch of the unioned inputs."""
    if k < 2:
        raise ValueError("k must be >= 2")
    groups = [F.col(c) for c in group_cols]
    hashed = df.select(
        *groups, _uniform_expr(F.col(value_col).cast("string"), salt).alias("_h")
    )

    out_fields = ", ".join(f"`{c}` string" for c in group_cols)
    kernel_schema = f"{out_fields}, _h double"
    gcols = list(group_cols)

    def _batch_minima(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # per group: distinct hashes, k smallest — bounded output.
            # dropna=False: pandas groupby silently drops NULL-keyed
            # groups by default, which would make a NULL group vanish
            # from the output (Spark's own groupBy keeps it)
            dedup = pdf.drop_duplicates(subset=gcols + ["_h"])
            yield (
                dedup.sort_values("_h")
                .groupby(gcols, sort=False, dropna=False)
                .head(k)[gcols + ["_h"]]
            )

    # group cols pass through the kernel as strings (stable Arrow types);
    # callers group on string-typed keys anyway (lang, source, ...)
    str_in = hashed.select(
        *[F.col(c).cast("string").alias(c) for c in gcols], "_h"
    )
    minima = str_in.mapInPandas(_batch_minima, schema=kernel_schema)

    return minima.groupBy(*gcols).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("mins")
    )


def _kmv_estimate(mins, k: int):
    """(k-1)/h_k when the sketch is full, exact slot count below."""
    n = F.size(mins)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at(mins, k)
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    salt: str = "",
) -> DataFrame:
    """Per group: KMV distinct-count estimate of `value_col`.

    Returns (group_cols..., n_seen_min: int  — number of sketch slots
    filled, = min(k, true distinct), est_distinct: double — exact count
    when the sketch is not full, else (k-1)/h_k). Deterministic for a
    fixed salt; invariant to input partitioning.
    """
    merged = kmv_sketch(df, group_cols, value_col, k, salt)
    return merged.select(
        *group_cols,
        F.size("mins").alias("n_seen_min"),
        F.round(_kmv_estimate(F.col("mins"), k), 4).alias("est_distinct"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    k: int,
) -> DataFrame:
    """Set algebra over two keyed KMV sketch tables (the `kmv_sketch`
    output shape, SAME k and salt on both sides): per key,

      est_a / est_b      — per-side distinct estimates,
      est_union          — estimate from the merged-and-recut sketch
                           (exact sketch of A ∪ B by the merge
                           property),
      jaccard            — |slots of the union sketch present in BOTH
                           side sketches| / |union slots| (the
                           bottom-k Jaccard estimator, Broder),
      est_intersection   — jaccard * est_union (the standard KMV
                           intersection estimate).

    Keys missing on one side get an empty sketch (est 0). All doubles
    derive from the same md5-uniform hashes both engines compute
    bit-identically, so the whole algebra is oracle-replayable.

    This is the 100 TB recrawl-planning shape: per-host content-change
    volume between two crawl waves from two O(k)-per-host sketch
    tables — the waves themselves are never joined."""
    if k < 2:
        raise ValueError("k must be >= 2")
    empty = F.array().cast("array<double>")
    sa = a.select(*keys, F.col("mins").alias("_ma"))
    sb = b.select(*keys, F.col("mins").alias("_mb"))
    j = sa.join(sb, keys, "full_outer").select(
        *keys,
        F.coalesce(F.col("_ma"), empty).alias("_ma"),
        F.coalesce(F.col("_mb"), empty).alias("_mb"),
    )
    union_mins = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("_ma"), F.col("_mb")))),
        1,
        k,
    )
    j = j.withColumn("_mu", union_mins)
    nu = F.size("_mu")
    common = F.size(
        F.filter(
            F.col("_mu"),
            lambda h: F.array_contains(F.col("_ma"), h)
            & F.array_contains(F.col("_mb"), h),
        )
    )
    union_est = _kmv_estimate(F.col("_mu"), k)
    jac = F.when(nu > 0, common.cast("double") / nu.cast("double")).otherwise(
        F.lit(0.0)
    )
    return j.select(
        *keys,
        F.round(_kmv_estimate(F.col("_ma"), k), 4).alias("est_a"),
        F.round(_kmv_estimate(F.col("_mb"), k), 4).alias("est_b"),
        F.round(union_est, 4).alias("est_union"),
        F.round(jac, 6).alias("jaccard"),
        F.round(jac * union_est, 4).alias("est_intersection"),
    )


def approx_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """Built-in HLL++ tier (constant state, one pass, no kernel) — the
    default at 100 TB when cross-engine determinism is not required."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold_ppm: int = 1000,
    k: int | None = None,
) -> DataFrame:
    """EXACT phi-heavy-hitters (all values whose count is >= phi of the
    total, phi = threshold_ppm / 1e6) with a Misra-Gries candidate tier
    so the exact aggregation never shuffles the full value distribution.

    The naive exact plan — groupBy(value).count() then filter — shuffles
    one (value, partial) row per distinct value per map task; over a
    100 TB token stream that is the vocabulary times the task count. The
    classic two-pass alternative (Misra & Gries 1982):

    - pass 1: per PARTITION, a bounded Misra-Gries summary with k
      counters (mapInPandas kernel with dict state across the
      partition's batches — at most k candidate values emitted per
      partition, amortized O(1) per row).
    - pass 2: exact counts for the candidate union only — the groupBy
      is semi-join-pruned map-side by the broadcast candidate set, so
      the shuffle carries at most (distinct candidates x tasks) rows.

    The stream total needed by the threshold ALSO comes out of pass 1:
    the kernel emits each partition's row count alongside its
    candidates (one sentinel row per partition), so the operator costs
    exactly two corpus passes, not three — an earlier draft ran a
    separate count(1) job and the plan showed a third full scan.

    Candidate completeness (why the answer is EXACT, not approximate):
    Misra-Gries with k counters over a partition of n_p items keeps
    every value whose local count exceeds n_p/(k+1). If a value has
    global share >= phi then by averaging it has local share >= phi in
    at least one partition, so with k >= 1/phi (the default sets
    k = 2*ceil(1e6/threshold_ppm)) it survives pass 1 somewhere. Values
    below phi may also survive; pass 2's exact filter removes them —
    the candidate SET varies with partitioning, the ANSWER never does
    (same contract as bloom.py's pre-filter tier; pinned by pytest).

    The threshold compare is pure integer math
    (count * 1_000_000 >= n_total * threshold_ppm) — no float share, so
    any engine replays it bit-identically.

    Returns (value_col, n_occurrences, n_total), one row per heavy
    hitter. Two passes over the input by design; persist the projected
    value column upstream if the producing plan is expensive.
    """
    if threshold_ppm < 1:
        raise ValueError("threshold_ppm must be >= 1")
    if k is None:
        k = 2 * ((1_000_000 + threshold_ppm - 1) // threshold_ppm)
    if k < 1:
        raise ValueError("k must be >= 1")
    vals = df.select(F.col(value_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for v in pdf["v"]:
                c = counters.get(v)
                if c is not None:
                    counters[v] = c + 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all: pairs each decrement with a prior
                    # increment, so total work is amortized O(1)/row
                    for t in list(counters):
                        nc = counters[t] - 1
                        if nc:
                            counters[t] = nc
                        else:
                            del counters[t]
            assert len(counters) <= k, "Misra-Gries state exceeded k"
        # sentinel row (v NULL) carries the partition's row count so the
        # stream total rides pass 1 instead of costing a third scan
        yield pd.DataFrame(
            {
                "v": list(counters.keys()) + [None],
                "n_part": [0] * len(counters) + [n_rows],
            }
        )

    # two consumers (candidate set + stream total) read the kernel
    # output; without lineage sharing Spark would run the MG pass twice
    # (no common-subplan reuse across different exchanges). The summary
    # is tiny (<= (k+1) x partitions rows), so localCheckpoint shares
    # one computed copy — the same trick components.py uses.
    summary = vals.mapInPandas(_mg, "v string, n_part long").localCheckpoint(
        eager=False
    )
    candidates = summary.filter(F.col("v").isNotNull()).select("v").distinct()
    total = summary.filter(F.col("v").isNull()).agg(
        F.coalesce(F.sum("n_part"), F.lit(0)).alias("n_total")
    )
    counts = (
        vals.join(F.broadcast(candidates), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences") * F.lit(1_000_000)
            >= F.col("n_total") * F.lit(threshold_ppm)
        )
        .select(F.col("v").alias(value_col), "n_occurrences", "n_total")
    )


def _hll_alpha(m: int) -> float:
    # Flajolet et al. 2007 bias constants
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 6,
    salt: str = "",
) -> DataFrame:
    """The mergeable HLL register table behind hll_distinct:
    (group_cols..., reg:int, rho_max:int) — at most 2^p rows per group
    regardless of input size. Registers merge by MAX, so sketches built
    over different corpus slices (files, days, crawl waves) compose
    without re-reading data; hll_estimate turns any merged register
    table back into a distinct-count estimate, and hll_set_ops derives
    union/intersection/Jaccard from two sketches. Construction and
    determinism notes in hll_distinct's docstring."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    rem_bits = 60 - p
    h = md5_long(F.col(value_col), salt)
    reg = F.shiftright(h, rem_bits)
    rest = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    rho = F.when(rest == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(rest))
    )
    groups = [F.col(c) for c in group_cols]
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, reg.cast("int").alias("reg"), rho.alias("_rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("_rho").cast("int").alias("rho_max"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Fold an hll_sketch register table (possibly merged across
    slices) into per-group estimates: (group_cols...,
    n_registers_hit:int, est_distinct:double). Exact-integer dyadic
    fold + small-range linear counting per hll_distinct's notes."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    rem_bits = 60 - p
    alpha = _hll_alpha(m)
    scale = float(1 << (rem_bits + 1))
    term = F.pow(F.lit(2.0), F.lit(rem_bits + 1) - F.col("rho_max")).cast(
        "long"
    )
    folded = regs.groupBy(*group_cols).agg(
        F.count("*").alias("_v"),
        (F.sum(term).cast("double") / F.lit(scale)).alias("_s"),
    )
    n_empty = F.lit(m) - F.col("_v")
    e_raw = F.lit(alpha * m * m) / (F.col("_s") + n_empty.cast("double"))
    est = F.when(
        (e_raw <= 2.5 * m) & (n_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty.cast("double")),
    ).otherwise(e_raw)
    return folded.select(
        *group_cols,
        F.col("_v").cast("int").alias("n_registers_hit"),
        F.round(est, 4).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 6,
    salt: str = "",
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate per group —
    the register-sketch sibling of `kmv_distinct` (Flajolet, Fusy,
    Gandouet, Meunier 2007), built on the same md5_long hash so any
    engine replays the estimate bit-for-bit (Spark's own
    approx_count_distinct is HLL++ too, but its hash is engine-private;
    see `approx_distinct`).

    Construction (m = 2^p registers over the 60-bit md5 hash):
    - register index = top p bits; remainder = low (60-p) bits
    - rho = position of the remainder's leftmost 1-bit from the top of
      the (60-p)-bit field, = (60-p) - bitlen(remainder) + 1, with the
      all-zero remainder mapping to (60-p)+1. bitlen rides `bin()`
      (binary string without leading zeros — identical in Spark and
      DuckDB), so rho is pure integer math: no log2-on-ints precision
      hazard.
    - per (group, register): M_j = max(rho). E_raw = alpha_m * m^2 /
      (sum_j 2^-M_j + n_empty); small-range correction (E <= 2.5m with
      empty registers) switches to linear counting m*ln(m/n_empty).
    - the 2^-M_j fold is EXACT-INTEGER: each term is scaled by
      2^(rem_bits+1) to the integer 2^(rem_bits+1-M_j) (max 2^(60-p),
      group total <= 2^60 — fits a BIGINT), summed as longs, and divided
      back once. A direct double fold of dyadic terms spanning up to
      rem_bits+1 exponents exceeds the 53-bit mantissa, making the sum
      rounding-order-dependent — i.e. partitioning-dependent.

    Shape at scale: the register projection is map-side; the first
    groupBy's PARTIAL aggregation caps what crosses the Exchange at
    m rows per group per task (the registers, never the values); the
    final per-group fold touches <= m rows. Registers are mergeable by
    max, so the sketch composes across files/days for incremental
    corpus accounting. NULL values are ignored (COUNT DISTINCT
    semantics).

    Returns (group_cols..., n_registers_hit: int, est_distinct: double
    rounded to 4dp). Invariant to input partitioning (pinned by pytest).
    """
    return hll_estimate(
        hll_sketch(df, group_cols, value_col, p=p, salt=salt),
        group_cols,
        p=p,
    )


def hll_set_ops(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 6,
) -> DataFrame:
    """Set algebra over two hll_sketch register tables — the HLL
    sibling of kmv_set_ops: union by register MAX-merge (EXACT by the
    merge property — identical to sketching the unioned inputs),
    intersection by inclusion-exclusion (est_a + est_b - est_union,
    clamped at 0), and Jaccard from the two. Everything runs on the
    O(2^p)-row sketch tables; the original inputs are never touched,
    so two crawl waves can be compared from yesterday's persisted
    sketches alone. Returns (group_cols..., est_a, est_b, est_union,
    est_intersection, jaccard — all doubles, 4dp; groups present in
    only one sketch estimate the other side as 0)."""
    groups = list(group_cols or [])
    u = (
        a.unionByName(b)
        .groupBy(*groups, "reg")
        .agg(F.max("rho_max").cast("int").alias("rho_max"))
    )

    def est(regs: DataFrame, name: str) -> DataFrame:
        e = hll_estimate(regs, groups, p=p)
        return e.select(
            *groups, F.col("est_distinct").alias(name)
        )

    ea, eb, eu = est(a, "est_a"), est(b, "est_b"), est(u, "est_union")
    if groups:
        j = eu.join(ea, groups, "left").join(eb, groups, "left")
    else:
        j = eu.crossJoin(ea).crossJoin(eb)
    inter = F.greatest(
        F.coalesce("est_a", F.lit(0.0))
        + F.coalesce("est_b", F.lit(0.0))
        - F.col("est_union"),
        F.lit(0.0),
    )
    return j.select(
        *groups,
        F.round(F.coalesce("est_a", F.lit(0.0)), 4).alias("est_a"),
        F.round(F.coalesce("est_b", F.lit(0.0)), 4).alias("est_b"),
        F.col("est_union"),
        F.round(inter, 4).alias("est_intersection"),
        F.round(
            F.when(F.col("est_union") > 0.0, inter / F.col("est_union"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("jaccard"),
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over a value
    column: d independent hash rows x w counters, returned as at most
    d*w (row_i, col_j, c) rows — a bounded, MERGEABLE summary of an
    unbounded stream of occurrences.

    Complements heavy_hitters (Misra-Gries): MG certifies the top
    candidates but keeps only k counters and answers nothing about
    non-candidates; CMS answers a point frequency estimate for ANY key
    with the one-sided guarantee est >= true (never under), and
    est <= true + (e/w)*N with probability 1 - (1/e)^d over the hash
    draw. Counters are plain sums, so sketches are additive: sketching
    partitions independently and summing cells equals sketching the
    whole corpus (partitioning-invariance, pinned by pytest).

    Shape at scale: one map-side projection per row builds the d
    (row, cell) targets (md5_long with per-row salts — deterministic
    and engine-portable, so the oracle replays every counter), one
    explode (d rows per item, d is 2-8), one hash aggregate whose
    output is <= d*w rows no matter the corpus size. Map-side partial
    aggregation collapses within-partition repeats before the Exchange.

    Null values are dropped (they are not occurrences of any key).
    `weight_col` generalizes occurrence counting to weighted sums.
    """
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    val = F.col(value_col)
    wt = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (md5_long(val.cast("string"), f"cms{i}") % w)
                .cast("int")
                .alias("col_j"),
            )
            for i in range(d)
        ]
    )
    return (
        df.filter(val.isNotNull())
        .select(F.explode(cells).alias("cell"), wt.alias("_w"))
        .groupBy(
            F.col("cell.row_i").alias("row_i"),
            F.col("cell.col_j").alias("col_j"),
        )
        .agg(F.sum("_w").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point frequency estimates from a cms_sketch: for each key,
    est = min over the d rows of its counter cell (missing cell = 0).
    `d`/`w` MUST match the sketch's build parameters — they define the
    hash family, not a tuning knob to vary per query.

    The sketch is d*w bounded rows and is BROADCAST; the keys side can
    be corpus-scale: its d cells are computed map-side and the join
    never shuffles the probe rows. Returns (key, est).
    """
    k = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (md5_long(k.cast("string"), f"cms{i}") % w)
                .cast("int")
                .alias("col_j"),
            )
            for i in range(d)
        ]
    )
    probes = (
        keys.filter(k.isNotNull())
        .select(k.alias("key"), F.explode(cells).alias("cell"))
        .select("key", F.col("cell.row_i").alias("row_i"), F.col("cell.col_j").alias("col_j"))
    )
    return (
        probes.join(F.broadcast(sketch), ["row_i", "col_j"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("est"))
    )


def _hdr_bucket_sql(v: str, k: int) -> str:
    """SQL-text HDR bucket id for non-negative BIGINT column `v` (shared
    verbatim with the DuckDB oracle, modulo DIV spelling): values < 2^k
    get exact buckets (bucket = v); larger values split each binary
    octave [2^e, 2^(e+1)) into 2^k equal steps —
    bucket = (e - k + 1) * 2^k + ((v - 2^e) >> (e - k)) with
    e = floor(log2 v) computed as length(bin(v)) - 1. Pure integer
    arithmetic (string-length log2, shifts for the step), so Spark and
    the oracle cannot diverge by a ULP. Negative input poisons the plan
    lazily via raise_error — no eager validation job."""
    m = 1 << k
    e = f"(length(bin({v})) - 1)"
    return f"""CASE
      WHEN {v} < 0 THEN CAST(raise_error(concat(
        'hdr_sketch requires non-negative values, got ',
        CAST({v} AS STRING))) AS BIGINT)
      WHEN {v} < {m} THEN CAST({v} AS BIGINT)
      ELSE CAST(({e} - {k} + 1) AS BIGINT) * {m}
           + shiftright({v} - shiftleft(CAST(1 AS BIGINT), {e}), {e} - {k})
    END"""


def _hdr_lower_sql(b: str, k: int) -> str:
    """SQL-text exact integer lower bound of an HDR bucket id (inverse
    of _hdr_bucket_sql): ids below 2^(k+1) are exact values; otherwise
    e = b div 2^k + k - 1 and lower = 2^e + (b mod 2^k) << (e - k)."""
    m = 1 << k
    return f"""CASE
      WHEN {b} < {2 * m} THEN CAST({b} AS BIGINT)
      ELSE shiftleft(CAST(1 AS BIGINT),
                     CAST({b} DIV {m} AS INT) + {k} - 1)
           + shiftleft({b} % {m}, CAST({b} DIV {m} AS INT) - 1)
    END"""


def hdr_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 4,
) -> DataFrame:
    """Mergeable quantile sketch over non-negative long values — the
    t-digest/KLL role (bounded-size distribution summary answering
    percentile queries, composable across corpus slices) — but
    DETERMINISTIC: the HDR-histogram bucketing (Tene's HdrHistogram;
    DDSketch's dyadic-gamma variant is the same idea) is a pure function
    of the value, so sketches are partitioning-invariant,
    engine-portable, and merge by plain cell addition — unlike
    t-digest/KLL, whose centroids/compactions depend on arrival order
    and therefore cannot be oracle-checked bit-for-bit.

    Buckets guarantee per-value relative error <= 2^-k (k=4 -> 6.25%,
    k=7 -> 0.8%); a full long range needs at most ~(64 - k) * 2^k
    buckets (~1k cells at k=4) no matter the data volume.

    Shape at scale: one map-side bucket projection, one hash aggregation
    with map-side combine whose output is bucket-bounded per group.
    Merging sketches = unionAll + the same re-aggregation (pinned by
    pytest against sketching the unioned input directly).

    Returns (group_cols..., bucket:long, c:long). NULL values are
    dropped; negative values fail the job lazily with a diagnosable
    raise_error.
    """
    if not 1 <= k <= 16:
        raise ValueError(f"need 1 <= k <= 16, got {k}")
    groups = list(group_cols or [])
    pre = df.filter(F.col(value_col).isNotNull()).select(
        *groups, F.col(value_col).cast("long").alias("_v")
    )
    return (
        pre.withColumn("bucket", F.expr(_hdr_bucket_sql("_v", k)))
        .groupBy(*groups, "bucket")
        .agg(F.count("*").alias("c"))
    )


def hdr_quantiles(
    sketch: DataFrame,
    q_ppm: list[int],
    group_cols: list[str] | None = None,
    k: int = 4,
) -> DataFrame:
    """Quantile estimates from an hdr_sketch: for each group and each
    requested quantile (parts-per-million ints — no float quantile
    column), the estimate is the LOWER BOUND of the first bucket whose
    cumulative count reaches ceil(q_ppm * n / 1e6) (clamped >= 1) in
    ascending bucket order — a one-sided floor estimate with
    est <= true quantile < (est + bucket width), bucket width / est
    <= 2^-k. `k` MUST match the sketch's build parameter — it defines
    the bucket family, not a tuning knob.

    The rank target is computed in pure integer arithmetic
    ((q * n + 999999) div 1e6 as BIGINT) — no double rounding even at
    10^12-row corpora. The sketch is bucket-bounded, so the per-group
    running sum is a window over ~1k rows per group, never a
    corpus-scale sort. Returns (group_cols..., q_ppm:int, est:long,
    n:long).
    """
    from pyspark.sql import Window

    if not q_ppm:
        raise ValueError("q_ppm must be a non-empty list of ppm ints")
    for q in q_ppm:
        if not 0 < q <= 1_000_000:
            raise ValueError(f"q_ppm entries must be in (0, 1e6], got {q}")
    if not 1 <= k <= 16:
        raise ValueError(f"need 1 <= k <= 16, got {k}")
    groups = list(group_cols or [])
    gcols = [F.col(g) for g in groups]
    cum = sketch.select(
        *groups,
        "bucket",
        F.sum("c")
        .over(
            Window.partitionBy(*gcols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.sum("c")
        .over(
            Window.partitionBy(*gcols).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)) for q in q_ppm])
    ).alias("q_ppm")
    probe = cum.select(*groups, "bucket", "cum", "n", qs).withColumn(
        "_r",
        F.expr(
            "greatest(CAST((CAST(q_ppm AS BIGINT) * n + 999999) "
            "DIV 1000000 AS BIGINT), CAST(1 AS BIGINT))"
        ),
    )
    hit = (
        probe.filter(F.col("cum") >= F.col("_r"))
        .groupBy(*groups, "q_ppm")
        .agg(F.min("bucket").alias("_b"), F.max("n").alias("n"))
    )
    return hit.select(
        *groups,
        F.col("q_ppm").cast("int").alias("q_ppm"),
        F.expr(_hdr_lower_sql("_b", k)).alias("est"),
        F.col("n").cast("long").alias("n"),
    )


def quantile_outlier_gate(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    q: int = 990_000,
    k: int = 4,
) -> DataFrame:
    """Per-group quantile outlier gate — the bounded-memory form of
    "drop documents longer than this group's p99": build the hdr_sketch
    per group, read the q-th quantile, broadcast the per-group bound
    back and verdict every row map-side. Because the quantile estimate
    is the deterministic bucket floor, the gate is reproducible
    run-to-run and engine-portable — unlike approxQuantile, whose
    result depends on sampling.

    Two passes over the value column (sketch, then verdict) but ZERO
    corpus-keyed shuffles: the sketch agg is bucket-bounded and the
    bound table (one row per group) broadcasts. A row is an outlier
    when value > est (est <= true quantile, so the gate errs toward
    keeping at most the sketch's 2^-k relative slack — never toward
    dropping a sub-quantile row). Returns the input columns plus
    (q_est:long, outlier:boolean)."""
    groups = list(group_cols or [])
    sk = hdr_sketch(df, value_col, groups, k=k)
    bounds = hdr_quantiles(sk, [q], groups, k=k).select(
        *groups, F.col("est").alias("q_est")
    )
    if groups:
        joined = df.join(F.broadcast(bounds), groups, "left")
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    return joined.withColumn(
        "outlier",
        F.coalesce(
            F.col(value_col).cast("long") > F.col("q_est"), F.lit(False)
        ),
    )
