"""Crawl politeness scheduling — turn a frontier wave (q113's
(host, url, indegree) output) into an executable fetch plan that
respects per-host crawl delays: every URL gets a host-sticky worker, a
within-host sequence number, and an exact integer fetch offset
(seq * delay_ms). This is the piece between frontier construction and
the fetchers: RFC 9309 leaves rate limits to the crawler, and every
production crawler (Heritrix's politeness queues, Nutch's
fetcher.queue.mode=byHost, StormCrawler) enforces them exactly this
way — one FIFO queue per host, one client owning each host.

Politeness invariant: all URLs of a host map to ONE worker
(md5(host) % n_workers — deterministic, no coordination), so a single
client serializes that host's fetches and the delay between consecutive
fetches is exactly delay_ms. Cross-host ordering inside a worker is
deliberately unspecified — workers interleave hosts freely as long as
each host's offsets are respected.

Shape at scale: worker assignment and delay lookup are map-side (the
per-host delay table is robots-derived and broadcast-sized); the only
Exchange is the per-host sequencing window, keyed by host. A host with
millions of frontier URLs would serialize that window AND the actual
crawl — cap it upstream with frontier_update's per_host_budget, which
is the same knob a real crawler turns (per-host queue depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from horus_spark.operators.sampling import md5_long


def schedule_fetches(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    n_workers: int = 32,
    default_delay_ms: int = 1000,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str | None = "indegree",
) -> DataFrame:
    """Assign every frontier URL (worker, seq, fetch_offset_ms):

    - worker = md5(host) % n_workers — host-sticky, map-side;
    - seq    = 0-based rank within the host, priority_col DESC then url
      ASC (high-value pages first; deterministic tie-break);
    - fetch_offset_ms = seq * delay_ms, where delay_ms comes from the
      broadcast `delays` table (host, delay_ms) — robots Crawl-delay or
      an operator-set override — falling back to default_delay_ms.

    Returns (host, url, worker, seq, delay_ms, fetch_offset_ms); exact
    long arithmetic throughout (no timestamp floats — callers add the
    wave's epoch start themselves)."""
    if n_workers < 1:
        raise ValueError(f"need n_workers >= 1, got {n_workers}")
    if default_delay_ms < 0:
        raise ValueError(
            f"need default_delay_ms >= 0, got {default_delay_ms}"
        )
    host, url = F.col(host_col), F.col(url_col)
    order = (
        [F.col(priority_col).desc(), url.asc()]
        if priority_col
        else [url.asc()]
    )
    seq = (
        F.row_number().over(Window.partitionBy(host).orderBy(*order)) - 1
    ).cast("long")
    base = frontier.select(
        host.alias("host"),
        url.alias("url"),
        (md5_long(host, "worker") % n_workers).cast("int").alias("worker"),
        seq.alias("seq"),
    )
    if delays is not None:
        base = base.join(
            F.broadcast(
                delays.select(
                    F.col("host"), F.col("delay_ms").cast("long").alias("_d")
                )
            ),
            "host",
            "left",
        )
    else:
        base = base.withColumn("_d", F.lit(None).cast("long"))
    delay = F.coalesce(F.col("_d"), F.lit(int(default_delay_ms)).cast("long"))
    return base.select(
        "host",
        "url",
        "worker",
        "seq",
        delay.alias("delay_ms"),
        (F.col("seq") * delay).alias("fetch_offset_ms"),
    )


def worker_load(schedule: DataFrame) -> DataFrame:
    """Per-worker load summary of a schedule_fetches plan — the skew
    report an operator reads before launching fetchers: n_hosts, n_urls,
    and horizon_ms = the worker's busy horizon (max over its hosts of
    that host's makespan: last offset + one delay). A worker whose
    horizon dwarfs the rest means one slow-delay or huge host dominates
    the wave — re-budget the frontier or split waves. Bounded output
    (n_workers rows); one slim shuffle on (worker, host) then a tiny
    rollup."""
    per_host = schedule.groupBy("worker", "host").agg(
        F.count("*").alias("n_urls"),
        (F.max("fetch_offset_ms") + F.max("delay_ms")).alias("makespan_ms"),
    )
    return per_host.groupBy("worker").agg(
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.sum("n_urls").cast("long").alias("n_urls"),
        F.max("makespan_ms").cast("long").alias("horizon_ms"),
    )
