"""Recrawl delta + per-host change rates.

Freshness is a first-class crawl signal: comparing two crawl waves'
(url, content digest) tables tells the scheduler which URLs changed
and which HOSTS churn — the input to recrawl prioritization (changed
hosts get revisited sooner; static archives fall back to slow cycles).

`crawl_delta` classifies every URL seen in either wave:
  new        — in the current wave only
  gone       — in the previous wave only
  modified   — in both, digest differs
  unchanged  — in both, digest equal
`host_change_rates` rolls the verdicts up per host with an integer-ppm
change rate over the URLs present in the CURRENT wave.

Scale shape: one full-outer equi-join on url of two slim (url, digest)
tables — both sides already distinct per url in a sane crawl store —
then a map-side verdict expression; the rollup is one hash agg whose
shuffle carries (host, 4 counters) after map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import host_of_expr


def crawl_delta(
    prev: DataFrame,
    curr: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """(url, host, status) for every URL in either wave; status in
    {'new','gone','modified','unchanged'}."""
    p = prev.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("_pd")
    )
    c = curr.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("_cd")
    )
    j = p.join(c, "url", "full_outer")
    status = (
        F.when(F.col("_pd").isNull(), F.lit("new"))
        .when(F.col("_cd").isNull(), F.lit("gone"))
        .when(F.col("_pd") == F.col("_cd"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return j.select(
        "url", host_of_expr(F.col("url")).alias("host"),
        status.alias("status"),
    )


def host_change_rates(delta: DataFrame) -> DataFrame:
    """Per host: verdict counters + change_ppm = (new + modified) ppm
    of the URLs present in the current wave (new+modified+unchanged).
    Hosts whose current wave is empty (all gone) report change_ppm 0."""
    one = lambda s: F.sum((F.col("status") == s).cast("long"))  # noqa: E731
    agg = delta.groupBy("host").agg(
        one("new").alias("n_new"),
        one("gone").alias("n_gone"),
        one("modified").alias("n_modified"),
        one("unchanged").alias("n_unchanged"),
    )
    denom = F.col("n_new") + F.col("n_modified") + F.col("n_unchanged")
    return agg.withColumn(
        "change_ppm",
        F.when(denom == 0, F.lit(0).cast("long")).otherwise(
            F.expr("(n_new + n_modified) * 1000000 div "
                   "(n_new + n_modified + n_unchanged)")
        ),
    )


def recrawl_schedule(
    rates: DataFrame,
    base_hours: int = 168,
    ref_ppm: int = 100_000,
    min_hours: int = 6,
    max_hours: int = 720,
    hot_ppm: int = 200_000,
    cold_ppm: int = 10_000,
) -> DataFrame:
    """Adaptive recrawl scheduling from host_change_rates — the
    freshness policy a crawler actually executes: hosts that change
    often get short revisit intervals, static hosts get long ones
    (Cho & Garcia-Molina 2003's uniform-resource result says allocate
    by change rate, clamped — exactly this shape).

        interval_hours = clamp(base_hours * ref_ppm div max(change_ppm, 1),
                               min_hours, max_hours)

    so a host changing at ref_ppm revisits every base_hours, a fully
    churning host hits the min_hours floor, and a dead-still host the
    max_hours ceiling — pure integer arithmetic, no float policy knobs.

    Tiers: 'hot' (change_ppm >= hot_ppm), 'cold' (<= cold_ppm), 'warm'
    between, and 'dead' for hosts whose current wave is empty (every
    URL gone — change_ppm 0 by convention; they take max_hours and a
    distinct tier so operators can retire them instead of slow-crawling
    them forever).

    Map-side over the host-bounded rates frame — zero shuffle; composes
    as host_change_rates(crawl_delta(prev, curr)) |> recrawl_schedule
    |> schedule_fetches(delays=...) for the full freshness loop.
    Returns (host, change_ppm, tier, interval_hours)."""
    if not 0 < min_hours <= max_hours:
        raise ValueError(
            f"need 0 < min_hours <= max_hours, got {min_hours}, {max_hours}"
        )
    if base_hours < 1 or ref_ppm < 1:
        raise ValueError(
            f"need base_hours, ref_ppm >= 1, got {base_hours}, {ref_ppm}"
        )
    alive = (
        F.col("n_new") + F.col("n_modified") + F.col("n_unchanged")
    ) > 0
    raw_interval = F.expr(
        f"CAST({int(base_hours)} AS BIGINT) * {int(ref_ppm)}"
        " div greatest(change_ppm, 1)"
    )
    interval = F.when(
        ~alive, F.lit(int(max_hours)).cast("long")
    ).otherwise(
        F.least(
            F.greatest(raw_interval, F.lit(int(min_hours)).cast("long")),
            F.lit(int(max_hours)).cast("long"),
        )
    )
    tier = (
        F.when(~alive, F.lit("dead"))
        .when(F.col("change_ppm") >= hot_ppm, F.lit("hot"))
        .when(F.col("change_ppm") <= cold_ppm, F.lit("cold"))
        .otherwise(F.lit("warm"))
    )
    return rates.select(
        "host",
        F.col("change_ppm").cast("long").alias("change_ppm"),
        tier.alias("tier"),
        interval.cast("long").alias("interval_hours"),
    )
