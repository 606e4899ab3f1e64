"""PageRank, heavy hitters, time-bucket rollup, z-order (q66-q69 units)."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- pagerank


def _python_pagerank(edges, n_iter=8, scale=10**12, damping=85):
    """Driver-side integer replay of operators/graph.pagerank."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    n = len(nodes)
    jump = (scale - (scale * damping) // 100) // n
    r = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for u, v in edges:
            contrib[v] += r[u] // out[u]
        d = sum(r[v] for v in nodes if v not in out)
        r = {
            v: jump + ((contrib[v] + d // n) * damping) // 100 for v in nodes
        }
    return r


def test_pagerank_matches_integer_replay(spark):
    from horus_spark.operators.graph import pagerank

    edges = [(i % 13, (i * 5 + 2) % 13) for i in range(40)]
    # make node 12 dangling: drop its out-edges
    edges = [(u, v) for u, v in edges if u != 12] + [(3, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, n_iter=8).collect()}
    assert got == _python_pagerank(edges)


def test_pagerank_partitioning_invariant(spark):
    from horus_spark.operators.graph import pagerank

    edges = [(i % 29, (i * 7 + 1) % 29) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank_micro"] for r in pagerank(df.repartition(1), n_iter=6).collect()}
    b = {r["node"]: r["rank_micro"] for r in pagerank(df.repartition(16), n_iter=6).collect()}
    assert a == b


def test_pagerank_sink_attracts_mass(spark):
    from horus_spark.operators.graph import pagerank

    # star into node 0 plus a 0->1 escape: 0 must outrank every leaf
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {x["node"]: x["rank_micro"] for x in pagerank(df, n_iter=10).collect()}
    assert r[0] > r[2] and r[0] > r[7]
    # total mass never exceeds the scale (remainders only ever drop)
    assert sum(r.values()) <= 10**12


def test_pagerank_empty_edges(spark):
    from horus_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, n_iter=3).count() == 0


# -------------------------------------------------------- heavy hitters


def test_heavy_hitters_exact_and_invariant(spark):
    from collections import Counter

    from horus_spark.operators.sketches import heavy_hitters

    # skewed stream: token t0 is ~30%, t1 ~10%, long uniform tail
    vals = (
        ["t0"] * 3000 + ["t1"] * 1000 + [f"tail{i % 500}" for i in range(6000)]
    )
    truth = Counter(vals)
    n = len(vals)
    want = {
        t: c for t, c in truth.items() if c * 1_000_000 >= n * 50_000
    }  # >= 5%
    df = spark.createDataFrame([(v,) for v in vals], "token string")
    for parts in (2, 16):
        rows = heavy_hitters(
            df.repartition(parts), "token", threshold_ppm=50_000
        ).collect()
        got = {r["token"]: r["n_occurrences"] for r in rows}
        assert got == want
        assert all(r["n_total"] == n for r in rows)


def test_heavy_hitters_small_k_still_exact(spark):
    # k barely above 1/phi: the MG guarantee is tight but sufficient
    from horus_spark.operators.sketches import heavy_hitters

    vals = ["hot"] * 400 + [f"u{i}" for i in range(600)]
    df = spark.createDataFrame([(v,) for v in vals], "token string").repartition(4)
    rows = heavy_hitters(df, "token", threshold_ppm=300_000, k=5).collect()
    assert {(r["token"], r["n_occurrences"]) for r in rows} == {("hot", 400)}


def test_heavy_hitters_rejects_bad_threshold(spark):
    from horus_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",)], "token string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "token", threshold_ppm=0)


# --------------------------------------------------------------- rollup


def test_rollup_gapfill_and_locf(spark):
    from horus_spark.operators.rollup import time_bucket_rollup

    rows = [
        # key "a": buckets 0 and 200 observed, 100 silent
        ("a", "1970-01-01 00:00:10", 1.5),
        ("a", "1970-01-01 00:00:50", 2.25),
        ("a", "1970-01-01 00:04:10", 4.0),
        # key "b": only bucket 100
        ("b", "1970-01-01 00:02:30", 10.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = time_bucket_rollup(df, "ts", "k", "value", width_s=100)
    got = {
        (r["k"], r["bucket_start"]): (
            r["n_events"],
            r["value_sum"],
            r["value_filled"],
        )
        for r in out.collect()
    }
    assert got == {
        ("a", 0): (2, 3.75, 3.75),
        ("a", 100): (0, None, 3.75),  # gap-filled, LOCF carries 3.75
        ("a", 200): (1, 4.0, 4.0),
        ("b", 0): (0, None, None),  # before b's first observation
        ("b", 100): (1, 10.0, 10.0),
        ("b", 200): (0, None, 10.0),
    }


def test_rollup_no_gapfill_no_locf(spark):
    from horus_spark.operators.rollup import time_bucket_rollup

    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:10", 1.0), ("a", "1970-01-01 00:10:10", 2.0)],
        "k string, ts string, value double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = time_bucket_rollup(
        df, "ts", "k", "value", width_s=60, gap_fill=False, locf=False
    ).collect()
    assert len(out) == 2  # only observed buckets
    assert all(r["value_sum"] == r["value_filled"] for r in out)


def test_rollup_guard_fails_runaway_gapfill(spark):
    from horus_spark.operators.rollup import time_bucket_rollup
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", 1.0), ("a", "2020-01-01 00:00:00", 2.0)],
        "k string, ts string, value double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    rolled = time_bucket_rollup(df, "ts", "k", "value", width_s=1,
                                max_fill_buckets=1000)
    # the guard is LAZY: construction launches no job and does not raise
    with pytest.raises(Exception) as exc:
        rolled.collect()
    assert "max_fill_buckets" in str(exc.value)


def test_rollup_construction_is_lazy(spark):
    # building the operator must launch NO Spark job (the dedup_pipeline
    # eager-count lesson from round 3)
    from horus_spark.operators.rollup import time_bucket_rollup

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:10", 1.0)], "k string, ts string, value double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    time_bucket_rollup(df, "ts", "k", "value", width_s=60)
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before


# --------------------------------------------------------------- zorder


def _morton_py(x, y):
    def spread(v):
        v &= 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(x) | (spread(y) << 1)


def test_zorder_key_matches_python_morton(spark):
    from horus_spark.operators.zorder import zorder_key_expr

    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y", zorder_key_expr(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _morton_py(r["x"], r["y"])


def test_zorder_layout_improves_2d_skipping(spark):
    """The point of the operator: per-partition (x, y) bounding boxes
    under z-order layout let a rectangle predicate prune most
    partitions on BOTH dimensions; a 1-D x-sorted layout cannot prune
    on y at all."""
    from horus_spark.operators.zorder import zorder_layout

    n, files = 4096, 16
    grid = int(n**0.5)
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 4294967296 % grid).alias("x"),
        ((F.col("id") * 40503) % 65536 % grid).alias("y"),
    )

    def overlapping_partitions(frame, lo, hi):
        # per-partition min/max box, the same stats parquet would keep
        stats = (
            frame.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            )
            .collect()
        )
        assert len(stats) == files
        return sum(
            1
            for s in stats
            if s["x1"] >= lo and s["x0"] <= hi and s["y1"] >= lo and s["y0"] <= hi
        )

    z = zorder_layout(df, "x", "y", n_files=files)
    linear = df.repartitionByRange(files, "x").sortWithinPartitions("x")
    lo, hi = 0, grid // 4 - 1  # a 1/16-area corner rectangle
    z_hit = overlapping_partitions(z, lo, hi)
    lin_hit = overlapping_partitions(linear, lo, hi)
    # x-sorted layout prunes on x only -> ~files/4 partitions overlap;
    # z-order boxes tile the plane -> strictly fewer, near files/16
    assert z_hit < lin_hit
    assert z_hit <= files // 4


def test_rollup_and_zorder_param_guards(spark):
    from horus_spark.operators.rollup import time_bucket_rollup
    from horus_spark.operators.zorder import zorder_layout

    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:10", 1.0)], "k string, ts string, value double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    with pytest.raises(ValueError):
        time_bucket_rollup(df, "ts", "k", "value", width_s=0)
    pts = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_layout(pts, "x", "y", n_files=0)


# ----------------------------------------------------------------- hits


def _python_hits(edges, n_iter=8, scale=10**12):
    """Driver-side integer replay of operators/graph.hits."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(n_iter):
        ar = {}
        for u, v in edges:
            ar[v] = ar.get(v, 0) + h[u]
        amax = max(ar.values())
        an = {v: (x * scale) // max(amax, 1) for v, x in ar.items()}
        hr = {}
        for u, v in edges:
            if v in an:
                hr[u] = hr.get(u, 0) + an[v]
        hmax = max(hr.values())
        hn = {u: (x * scale) // max(hmax, 1) for u, x in hr.items()}
        h = {v: hn.get(v, 0) for v in nodes}
        a = {v: an.get(v, 0) for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def test_hits_matches_integer_replay(spark):
    from horus_spark.operators.graph import hits

    edges = [(i % 11, (i * 3 + 1) % 11) for i in range(50)]
    edges += [(4, 9), (5, 9), (6, 9)]  # boost node 9's authority
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits(df, n_iter=8).collect()
    }
    assert got == _python_hits(edges)


def test_hits_partitioning_invariant(spark):
    from horus_spark.operators.graph import hits

    edges = [(i % 23, (i * 7 + 2) % 23) for i in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits(df.repartition(1), n_iter=5).collect()
    }
    b = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits(df.repartition(16), n_iter=5).collect()
    }
    assert a == b


def test_hits_hub_vs_authority_roles(spark):
    from horus_spark.operators.graph import hits

    # bipartite: hubs 0-2 each point at authorities 10-12; no back-edges.
    edges = [(u, v) for u in (0, 1, 2) for v in (10, 11, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {
        x["node"]: (x["hub_micro"], x["auth_micro"])
        for x in hits(df, n_iter=4).collect()
    }
    for u in (0, 1, 2):  # pure hubs: max hub mass, zero authority
        assert r[u] == (10**12, 0)
    for v in (10, 11, 12):  # pure authorities: zero hub mass
        assert r[v] == (0, 10**12)


def test_hits_rejects_bad_iter(spark):
    from horus_spark.operators.graph import hits

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        hits(df, n_iter=0)


def test_trustrank_seed_decay_and_unreachable_zero(spark):
    from pyspark.sql import functions as F

    from horus_spark.operators.graph import trustrank

    # cycle seeded at 0 (0 -> 1 -> 2 -> 0) converges smoothly (a
    # dangling tail instead would recycle ALL its mass through the
    # seed and oscillate with the cycle period — exact dynamics, not a
    # bug; the python differential below pins that case); island
    # 10 -> 11 is never reachable from the seed
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["trust_micro"]
        for r in trustrank(e, seeds, n_iter=12).collect()
    }
    # trust decays with link distance from the seed
    assert got[0] > got[1] > got[2] > 0
    assert got[0] == 475675476421  # python-replay pinned value
    # unreachable island holds exactly zero
    assert got[10] == 0 and got[11] == 0


def test_trustrank_python_differential(spark):
    import itertools

    from horus_spark.operators.graph import trustrank

    pairs = [(i, (i * 7 + 3) % 13) for i in range(13)] + [
        (i, (i * 5 + 1) % 13) for i in range(13)
    ]
    pairs = sorted(set((a, b) for a, b in pairs))
    seed_list = [0, 5]
    scale, damp, n_iter = 1_000_000_000_000, 85, 6

    nodes = sorted(set(itertools.chain.from_iterable(pairs)) | set(seed_list))
    out: dict[int, list[int]] = {}
    for a, b in pairs:
        out.setdefault(a, []).append(b)
    k = len(seed_list)
    jump = (scale - scale * damp // 100) // k
    r = {v: (scale // k if v in seed_list else 0) for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        dangling = 0
        for u in nodes:
            if u in out:
                share = r[u] // len(out[u])
                for v in out[u]:
                    contrib[v] += share
            else:
                dangling += r[u]
        r = {
            v: (jump if v in seed_list else 0)
            + ((contrib[v] + (dangling // k if v in seed_list else 0)) * damp)
            // 100
            for v in nodes
        }
    e = spark.createDataFrame(pairs, "src long, dst long")
    seeds = spark.createDataFrame([(s,) for s in seed_list], "node long")
    got = {
        row["node"]: row["trust_micro"]
        for row in trustrank(e, seeds, n_iter=n_iter).collect()
    }
    assert got == r


def test_trustrank_guards(spark):
    import pytest

    from horus_spark.operators.graph import trustrank

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        trustrank(e, e.select(F.col("src").alias("node")).where("1=0"))
