"""Connected components (large-star/small-star) vs a union-find reference."""

import random

from pyspark.sql import functions as F

from horus_spark.operators.components import assign_clusters, connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node id in component
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def _check_graph(spark, n_nodes, edges):
    pairs = spark.createDataFrame(
        [(f"d{a:04d}", f"d{b:04d}") for a, b in edges], "id_a string, id_b string"
    )
    got = {
        r.id: r.cluster_id
        for r in connected_components(pairs).collect()
    }
    expected = _union_find(n_nodes, edges)
    touched = sorted({x for e in edges for x in e if e[0] != e[1]})
    # the documented contract: one row for EVERY id appearing in pairs,
    # including each component's root (root maps to itself)
    assert set(got) == {f"d{v:04d}" for v in touched}
    for v in touched:
        want = f"d{expected[v]:04d}"
        assert got[f"d{v:04d}"] == want, (v, got[f"d{v:04d}"], want)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    _check_graph(spark, n, edges)


def test_chain_converges_in_log_rounds(spark):
    # a 60-link chain: naive min-propagation needs ~60 rounds; the star
    # algorithm must finish well inside the max_iter=25 guard
    edges = [(i, i + 1) for i in range(60)]
    pairs = spark.createDataFrame(
        [(f"d{a:04d}", f"d{b:04d}") for a, b in edges], "id_a string, id_b string"
    )
    got = connected_components(pairs, max_iter=12).collect()
    assert all(r.cluster_id == "d0000" for r in got)
    # every id in pairs gets a row, INCLUDING the root (round-4 contract)
    assert {r.id for r in got} == {f"d{i:04d}" for i in range(0, 61)}


def test_two_components_and_duplicate_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (2, 3), (10, 11), (11, 10), (3, 1)]
    _check_graph(spark, 12, edges)


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a string, id_b string")
    assert connected_components(pairs).count() == 0


def test_assign_clusters_includes_singletons(spark):
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(8)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("d1", "d3"), ("d3", "d5"), ("d6", "d7")], "id_a string, id_b string"
    )
    rows = {r.id: r for r in assign_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    assert rows["d1"].cluster_id == "d1" and rows["d1"].cluster_size == 3
    assert rows["d3"].cluster_id == "d1" and rows["d5"].cluster_id == "d1"
    assert rows["d6"].cluster_id == "d6" and rows["d7"].cluster_size == 2
    # singletons map to themselves with size 1
    assert rows["d0"].cluster_id == "d0" and rows["d0"].cluster_size == 1
    # keep-one-per-group: exactly one row per cluster has id == cluster_id
    keep = [r for r in rows.values() if r.id == r.cluster_id]
    assert len(keep) == 5  # d0, d1, d2, d4, d6


def test_components_audit_fires_on_planted_corruption(spark):
    """The q194 structural audits must not be vacuous: a correct
    clustering scores all zeros, and each planted corruption trips
    exactly its own counter."""
    from __spark_entry__ import _components_audit_frame

    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(8)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("d1", "d3"), ("d3", "d5"), ("d6", "d7")], "id_a string, id_b string"
    )
    good = assign_clusters(docs, pairs)

    def audit(clusters):
        r = _components_audit_frame(docs, pairs, clusters).collect()[0]
        return (
            r.n_edge_violations, r.n_canonical_violations,
            r.n_size_violations, r.n_undersupported_clusters,
        )

    assert audit(good) == (0, 0, 0, 0)

    # under-merge: d5 torn out of its cluster -> the (d3,d5) pair's
    # endpoints disagree (edge violation) and sizes go stale
    torn = good.withColumn(
        "cluster_id",
        F.when(F.col("id") == "d5", F.lit("d5")).otherwise(F.col("cluster_id")),
    )
    ev, cv, sv, uv = audit(torn)
    assert ev >= 1 and sv >= 1

    # over-merge: unrelated singletons d0/d2/d4 fused into one
    # 3-member cluster with zero supporting pairs -> undersupported
    fused = good.withColumn(
        "cluster_id",
        F.when(
            F.col("id").isin("d0", "d2", "d4"), F.lit("d0")
        ).otherwise(F.col("cluster_id")),
    )
    ev, cv, sv, uv = audit(fused)
    assert uv >= 1 and sv >= 1

    # canonical violation: a cluster labeled by a non-minimum member
    relabel = good.withColumn(
        "cluster_id",
        F.when(F.col("cluster_id") == "d1", F.lit("d3")).otherwise(
            F.col("cluster_id")
        ),
    )
    ev, cv, sv, uv = audit(relabel)
    assert cv >= 1
