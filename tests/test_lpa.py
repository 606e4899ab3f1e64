"""Synchronous label propagation (operators/graph.py:label_propagation)."""

from pyspark.sql import functions as F

from horus_spark.operators.graph import label_propagation


def _labels(spark, pairs, n_iter=5):
    e = spark.createDataFrame(pairs, "src long, dst long")
    return {
        r["node"]: r["label"]
        for r in label_propagation(e, n_iter=n_iter).collect()
    }


def test_two_cliques_with_bridge(spark):
    # two triangles joined by one bridge edge: LPA keeps them as two
    # communities (the bridge vote is outnumbered by the clique)
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    got = _labels(spark, tri1 + tri2 + [(2, 10)])
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11] == got[12]
    assert got[0] != got[10]


def test_sync_update_and_min_tie_break(spark):
    # a path 0-1-2 under SYNCHRONOUS updates: the classic 2-coloring
    # oscillation (Raghavan et al. §3 note) — state is period-2, and
    # the fixed iteration count pins exactly one phase of it:
    #   iter1: (1, 0, 1)   iter2: (0, 1, 0)   iter3: (1, 0, 1) ...
    assert _labels(spark, [(0, 1), (1, 2)], n_iter=3) == {0: 1, 1: 0, 2: 1}
    assert _labels(spark, [(0, 1), (1, 2)], n_iter=4) == {0: 0, 1: 1, 2: 0}


def test_python_replay_differential(spark):
    # pure-python synchronous replay on a small random-ish graph
    pairs = [(i, (i * 7 + 3) % 23) for i in range(23)] + [
        (i, (i * 5 + 1) % 23) for i in range(23)
    ]
    n_iter = 3
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(n_iter):
        new = {}
        for v in adj:
            cnt: dict[int, int] = {}
            for u in adj[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[v] = best
        lab = new
    assert _labels(spark, pairs, n_iter=n_iter) == lab


def test_partitioning_invariance(spark):
    pairs = [(i, (i + 1) % 9) for i in range(9)] + [(3, 7), (2, 5)]
    e1 = spark.createDataFrame(pairs, "src long, dst long").repartition(1)
    e8 = spark.createDataFrame(pairs, "src long, dst long").repartition(
        8, F.col("dst")
    )
    r1 = {
        r["node"]: r["label"] for r in label_propagation(e1, n_iter=4).collect()
    }
    r8 = {
        r["node"]: r["label"] for r in label_propagation(e8, n_iter=4).collect()
    }
    assert r1 == r8


def test_self_loops_dropped(spark):
    got = _labels(spark, [(0, 0), (0, 1)], n_iter=2)
    assert set(got) == {0, 1}


def test_isolated_and_selfloop_only_nodes_emit_self_label(spark):
    # node 5 appears ONLY in a self-loop; nodes 0/1 form an edge.
    # Both universes must be covered: 5 keeps its self-label instead
    # of vanishing from the output (consumers joining labels back
    # would otherwise see NULL communities).
    got = _labels(spark, [(0, 1), (5, 5)], n_iter=3)
    assert got[5] == 5
    assert set(got) == {0, 1, 5}
