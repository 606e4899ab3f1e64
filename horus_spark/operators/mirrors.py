"""Host-level mirror detection over page-content fingerprints.

Mirror sites (same content republished under another host — CDNs
without canonical tags, scraper farms, institutional mirrors) waste
crawl budget and poison per-domain statistics, and DOCUMENT-level
dedup alone cannot say "skip this whole host". `host_mirror_pairs`
lifts exact content fingerprints to host granularity: hosts whose
fingerprint SETS overlap heavily (asymmetric containment, the Broder
measure q65 uses at document level) are mirror candidates the frontier
can collapse.

Scale shape: the inverted index (digest -> hosts) is built from
distinct (host, digest) rows — slim pairs with map-side combine.
Digests carried by more than `max_hosts_per_digest` hosts are pruned
BEFORE pairing (site chrome and ubiquitous boilerplate would otherwise
explode the self-join quadratically — the same df-prune as the TF-IDF
pair miner); a true mirror pair shares many SITE-SPECIFIC digests, so
the prune costs recall only on content that identifies no particular
host. All arithmetic is integer (ppm containments via integer
division) — engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_mirror_pairs(
    pages: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
    min_shared: int = 2,
    min_containment_ppm: int = 800_000,
    max_hosts_per_digest: int = 20,
) -> DataFrame:
    """Candidate mirror pairs: (host_a, host_b, shared, size_a, size_b,
    containment_a_ppm, containment_b_ppm) for host pairs sharing
    >= min_shared non-ubiquitous digests where the SMALLER side's
    containment (= max of the two) reaches min_containment_ppm.
    host_a < host_b lexicographically."""
    if not (0 < min_containment_ppm <= 1_000_000):
        raise ValueError(
            "min_containment_ppm must be in (0, 1000000], got "
            f"{min_containment_ppm}"
        )
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    sets = pages.select(
        F.col(host_col).alias("host"), F.col(digest_col).alias("digest")
    ).distinct()
    sizes = sets.groupBy("host").agg(F.count("*").alias("size"))
    spread = sets.groupBy("digest").agg(F.count("*").alias("n_hosts"))
    pruned = sets.join(
        spread.where(F.col("n_hosts") <= max_hosts_per_digest).select(
            "digest"
        ),
        "digest",
    )
    a = pruned.select(
        F.col("host").alias("host_a"), F.col("digest").alias("digest")
    )
    b = pruned.select(
        F.col("host").alias("host_b"), F.col("digest").alias("digest")
    )
    shared = (
        a.join(b, "digest")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(
        F.col("host").alias("host_a"), F.col("size").alias("size_a")
    )
    sb = sizes.select(
        F.col("host").alias("host_b"), F.col("size").alias("size_b")
    )
    out = shared.join(sa, "host_a").join(sb, "host_b")
    ca = F.expr("shared * 1000000 div size_a")
    cb = F.expr("shared * 1000000 div size_b")
    return (
        out.select(
            "host_a",
            "host_b",
            "shared",
            "size_a",
            "size_b",
            ca.alias("containment_a_ppm"),
            cb.alias("containment_b_ppm"),
        )
        .where(
            (F.col("shared") >= min_shared)
            & (
                F.greatest(
                    F.col("containment_a_ppm"), F.col("containment_b_ppm")
                )
                >= min_containment_ppm
            )
        )
    )
