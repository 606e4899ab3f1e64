"""Triangle counting (graph.triangles) and funnel analysis (funnel.funnel)."""

import hashlib
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.funnel import funnel, funnel_summary
from horus_spark.operators.graph import triangles


def _tri_brute(edges):
    """Python reference: per-node triangle counts over canonical edges."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b in es:
        for c in adj[a] & adj[b]:
            tri[a] += 1
            tri[b] += 1
    # each triangle at node v is seen via both of v's edges in it
    return {n: (t // 2, len(adj[n])) for n, t in tri.items()}


def _run(spark, edges, partitions=4):
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    ).repartition(partitions)
    out = triangles(df)
    return {
        r["node"]: (r["n_triangles"], r["degree"], r["clustering_ppm"])
        for r in out.collect()
    }


def test_k4_plus_pendant(spark):
    # K4: every node in 3 triangles, coefficient exactly 1e6 ppm.
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    got = _run(spark, k4 + [(0, 9)])
    assert got[1] == (3, 3, 1_000_000)
    assert got[2] == (3, 3, 1_000_000)
    assert got[3] == (3, 3, 1_000_000)
    # node 0 gains the pendant edge: deg 4, 3 triangles -> 2*3e6/12
    assert got[0] == (3, 4, 500_000)
    # pendant node: degree 1, no triangles, ppm 0
    assert got[9] == (0, 1, 0)


def test_duplicates_loops_direction_ignored(spark):
    tri = [(0, 1), (1, 2), (2, 0)]
    noisy = tri + [(1, 0), (2, 1), (0, 2), (0, 0), (1, 1), (0, 1), (0, 1)]
    assert _run(spark, noisy) == _run(spark, tri)


def test_differential_random_graph(spark):
    # md5-derived pseudo-random graph, checked vs the python reference
    # at two partitionings (partitioning invariance).
    n = 40
    edges = []
    for i in range(400):
        h = hashlib.md5(f"tri-{i}".encode()).hexdigest()
        a, b = int(h[:8], 16) % n, int(h[8:16], 16) % n
        edges.append((a, b))
    want = _tri_brute(edges)
    for parts in (2, 9):
        got = _run(spark, edges, partitions=parts)
        assert set(got) == set(want)
        for node, (tri_n, deg) in want.items():
            gt, gd, gp = got[node]
            assert (gt, gd) == (tri_n, deg), f"node {node}"
            exp_ppm = (2 * tri_n * 1_000_000) // (deg * (deg - 1)) if deg >= 2 else 0
            assert gp == exp_ppm


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1, 0, s // 60, s % 60), u, t)
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_funnel_depths_and_window(spark):
    rows = [
        # u1 completes in order within window
        (1, "signup", 0), (1, "view", 10), (1, "purchase", 20),
        # u2: purchase BEFORE view -> depth 2 only... view at 30, no
        # purchase after it -> stops at 2
        (2, "signup", 0), (2, "purchase", 5), (2, "view", 30),
        # u3: step 2 outside the 60 s window -> depth 1
        (3, "signup", 0), (3, "view", 120),
        # u4: never signs up but has funnel-type events -> depth 0 row
        (4, "view", 0), (4, "purchase", 1),
        # u5: second signup is NOT a re-anchor; view within window of
        # the FIRST signup only if <= 60 -> 70 is out -> depth 1
        (5, "signup", 0), (5, "signup", 50), (5, "view", 70),
    ]
    out = funnel(_ev(spark, rows), ["signup", "view", "purchase"], window_s=60)
    got = {r["user_id"]: (r["n_steps"], r["completed"]) for r in out.collect()}
    assert got == {
        1: (3, True),
        2: (2, False),
        3: (1, False),
        4: (0, False),
        5: (1, False),
    }
    anchors = {r["user_id"]: r["anchor_us"] for r in out.collect()}
    assert anchors[4] is None
    assert anchors[1] is not None


def test_funnel_tie_broken_by_event_id(spark):
    # signup and view at the SAME timestamp: the view's higher event_id
    # places it after the signup in the total order -> it counts.
    df = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1), 1, "signup"),
            (11, datetime(2024, 1, 1), 1, "view"),
            # reversed ids for user 2: view sorts BEFORE signup -> skipped
            (21, datetime(2024, 1, 1), 2, "signup"),
            (20, datetime(2024, 1, 1), 2, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = funnel(df, ["signup", "view"], window_s=60)
    got = {r["user_id"]: r["n_steps"] for r in out.collect()}
    assert got == {1: 2, 2: 1}


def test_funnel_summary_cumulative(spark):
    rows = [
        (1, "signup", 0), (1, "view", 1), (1, "purchase", 2),
        (2, "signup", 0), (2, "view", 1),
        (3, "signup", 0),
        (4, "view", 0),
    ]
    per_user = funnel(_ev(spark, rows), ["signup", "view", "purchase"], window_s=60)
    got = {r["depth"]: r["n_reached"] for r in funnel_summary(per_user).collect()}
    # at-least counts: depth 0 = all 4 users, 1 = 3, 2 = 2, 3 = 1
    assert got == {0: 4, 1: 3, 2: 2, 3: 1}


def test_funnel_guards(spark):
    df = _ev(spark, [(1, "signup", 0)])
    with pytest.raises(ValueError):
        funnel(df, ["signup"], window_s=60)
    with pytest.raises(ValueError):
        funnel(df, ["signup", "signup"], window_s=60)
    with pytest.raises(ValueError):
        funnel(df, ["signup", "view"], window_s=0)
