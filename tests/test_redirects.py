"""Redirect-chain resolution (operators/redirects.py, oracle q117)."""

import pytest

from horus_spark.operators.redirects import resolve_redirects


def _run(spark, edges, urls, max_hops=8):
    e = spark.createDataFrame(edges, "src_url string, dst_url string")
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {
        r.url: (r.final_url, r.hops, r.status)
        for r in resolve_redirects(u, e, max_hops=max_hops).collect()
    }


def test_chains_cycles_and_cap(spark):
    edges = (
        [("a", "b"), ("b", "c")]            # 2-hop chain -> terminal c
        + [("p", "q"), ("q", "p")]          # 2-cycle
        + [("f", "p")]                      # feeder into the cycle
        + [(f"n{i}", f"n{i+1}") for i in range(9)]  # 9-hop chain > cap
    )
    got = _run(spark, edges, ["a", "b", "c", "p", "f", "n0", "n1", "zz"])
    assert got["a"] == ("c", 2, "resolved")
    assert got["b"] == ("c", 1, "resolved")
    assert got["c"] == ("c", 0, "resolved")      # terminal, 0 hops
    assert got["zz"] == ("zz", 0, "resolved")    # never redirected
    # cycle member: 8 hops of a 2-cycle from p lands back on p
    assert got["p"] == ("p", 8, "cycle_or_long")
    # feeder: 1 hop to p then 7 around the cycle -> q has an out-edge
    assert got["f"] == ("q", 8, "cycle_or_long")
    # chain longer than the cap: cut at 8 with an out-edge remaining
    assert got["n0"] == ("n8", 8, "cycle_or_long")
    # chain of EXACTLY the cap resolves: n1 -> n9 in 8 hops, terminal
    assert got["n1"] == ("n9", 8, "resolved")


def test_python_walk_differential(spark):
    # functional map over 40 nodes with mixed terminals and a 3-cycle
    nxt = {}
    for i in range(40):
        if i % 7 == 6:
            continue                      # terminal
        nxt[i] = 30 + (i % 3) if i % 11 == 5 else i + 1
    nxt[30], nxt[31], nxt[32] = 31, 32, 30   # 3-cycle
    edges = [(f"u{a}", f"u{b}") for a, b in nxt.items()]
    urls = [f"u{i}" for i in range(40)]
    got = _run(spark, edges, urls, max_hops=16)

    for i in range(40):
        cur, hops = i, 0
        while hops < 16 and cur in nxt:
            cur, hops = nxt[cur], hops + 1
        status = "cycle_or_long" if cur in nxt else "resolved"
        assert got[f"u{i}"] == (f"u{cur}", hops, status), f"u{i}"


def test_max_hops_guard(spark):
    e = spark.createDataFrame([("a", "b")], "src_url string, dst_url string")
    u = spark.createDataFrame([("a",)], "url string")
    with pytest.raises(ValueError):
        resolve_redirects(u, e, max_hops=6)


def test_resolve_aliases_precedence_and_channels(spark):
    from horus_spark.operators.redirects import resolve_aliases

    redirects = spark.createDataFrame(
        [("a", "b")], "src_url string, dst_url string"
    )
    canonicals = spark.createDataFrame(
        # 'a' also has a canonical (redirect must win); 'b' resolves
        # via canonical; 'c' is self-canonical (dropped -> terminal)
        [("a", "z"), ("b", "c"), ("c", "c")],
        "src_url string, dst_url string",
    )
    urls = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "url string"
    )
    got = {
        r["url"]: (r["final_url"], r["hops"], r["status"])
        for r in resolve_aliases(urls, redirects, canonicals).collect()
    }
    assert got["a"] == ("c", 2, "resolved")  # a -REDIRECT-> b -canon-> c
    assert got["b"] == ("c", 1, "resolved")
    assert got["c"] == ("c", 0, "resolved")  # self-canonical dropped
    assert got["d"] == ("d", 0, "resolved")


def test_resolve_aliases_duplicate_srcs_deterministic(spark):
    from horus_spark.operators.redirects import resolve_aliases

    canonicals = spark.createDataFrame(
        [("a", "y"), ("a", "x")], "src_url string, dst_url string"
    )
    urls = spark.createDataFrame([("a",)], "url string")
    empty = canonicals.where("1=0")
    r = resolve_aliases(urls, empty, canonicals).collect()[0]
    assert r["final_url"] == "x"  # smallest destination wins
