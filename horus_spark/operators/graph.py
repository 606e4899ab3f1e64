"""Link-graph centrality for web-corpus curation: fixed-iteration
PageRank over an edge list, in EXACT integer arithmetic.

Why an engine needs this: domain- and page-level PageRank is a standard
web-corpus quality prior (CommonCrawl ranks hosts this way; quality
classifiers and crawl schedulers consume it). The natural input here is
the domain link graph that `urls.py` surfaces — hundreds of millions of
nodes at 100 TB, far beyond a driver-side graph library.

Determinism: floating-point PageRank is NOT reproducible across
partitionings — the per-node contribution sum is a float reduction whose
order Spark does not fix. This implementation keeps the entire rank
vector in integer micro-units (`scale` = 1e12 by default):

- contributions are `rank div outdeg` (integer division),
- damping is `(x * damping_pct) div 100` (exact, overflow-safe under
  ANSI mode: x <= scale = 1e12, x * 99 < 2^63),
- the dangling-node mass is redistributed as `D div n`.

Long addition is associative/commutative, so every engine and every
partitioning produces bit-identical ranks — which is what lets the
DuckDB oracle replay the same recursion and hash-match.

Scale shape (per iteration, the Pregel-on-DataFrames pattern):
- ONE shuffle: `groupBy(dst)` over the contribution stream with map-side
  partial aggregation (only (node, partial-sum) longs cross the wire).
- The dangling mass is a 1-row aggregate cross-joined back via
  broadcast — no driver collect inside the loop; the only driver action
  is the upfront node count.
- `localCheckpoint(eager=False)` truncates the iterative lineage the
  same way `components.py` does (swap for `checkpoint()` against
  reliable storage on a real cluster).
- Rank state is (node, long) — 16 bytes/node. The edge relation is
  static across rounds, so it is checkpointed ONCE up front — without
  that, every iteration re-embeds the edge-producing subplan and the
  final plan scans the edge source n_iter times (on a real cluster,
  `.persist()`/pre-partition by src instead so each round's join reuses
  the layout).

Reference parity note: the reference engine has no graph stage; this
extends the LLM-data-pipeline tier (cited shape: Page et al. 1999; the
Kiveris et al. 2014 star algorithms next door in components.py handle
the undirected-closure side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping_pct: int = 85,
    scale: int = 1_000_000_000_000,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration integer PageRank.

    Input: an edge list (directed; duplicates and self-loops are
    deduplicated/kept respectively — a self-loop is a legal edge).
    Output: (node, rank_micro) for every node appearing in `edges`,
    where rank_micro is the PageRank mass in `1/scale` units after
    exactly `n_iter` iterations from the uniform start. Sum over nodes
    is <= scale (integer-division remainders are dropped, never
    redistributed — both deliberate and engine-reproducible).

    `damping_pct` is the damping factor as an integer percentage (85 =
    the classic 0.85) so the teleport term stays in exact arithmetic.
    """
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if use_local_checkpoint:
        # static across rounds: one materialization instead of n_iter
        # re-scans of the edge-producing plan
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n = nodes.count()  # the one driver action; O(nodes) tiny aggregate
    if n == 0:
        return nodes.withColumn("rank_micro", F.lit(0).cast("long"))

    # teleport mass per node, computed once in exact python ints
    jump = (scale - (scale * damping_pct) // 100) // n

    # rank state: (node, r long). outdeg joined in once so the loop's
    # contribution projection is a plain column op.
    ranks = nodes.join(outdeg, "node", "left").select(
        "node", F.lit(scale // n).cast("long").alias("r"), "deg"
    )

    for _ in range(n_iter):
        contrib = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r div deg")).alias("c"))
        )
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("d")
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(jump).cast("long")
                    + F.expr(
                        f"((coalesce(c, 0L) + (d div {n})) * {damping_pct}) div 100"
                    )
                ).cast("long").alias("r"),
                "deg",
            )
        )
        if use_local_checkpoint:
            ranks = ranks.localCheckpoint(eager=False)

    return ranks.select("node", F.col("r").alias("rank_micro"))


def _norm_div(val: str, mx: str, scale: int) -> str:
    """(val * scale) div max — the max-normalization step in EXACT
    integer arithmetic. The product can exceed int64 (val <= n * scale),
    so it runs in DECIMAL(38,0); `div` returns a long, and the quotient
    is <= scale by construction (val <= mx). DuckDB replays the same
    expression over HUGEINT — both are exact integer division, so the
    results are bit-identical."""
    return (
        f"CAST((CAST({val} AS DECIMAL(38,0)) * CAST({scale} AS DECIMAL(38,0)))"
        f" div greatest({mx}, 1) AS BIGINT)"
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 8,
    scale: int = 1_000_000_000_000,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999): hub and authority scores
    over a directed edge list, in exact integer arithmetic.

    PageRank's complement for web curation: authorities are the pages
    good hubs point AT (content quality prior), hubs are the pages that
    point at good authorities (directory/spam detection — a high-hub
    low-authority host is a link farm). Per iteration:

        a[v] = sum of h[u] over in-edges, then max-normalized;
        h[u] = sum of a[v] over out-edges, then max-normalized.

    Max-normalization (rather than L2, the textbook choice) keeps every
    step in integers: sums are exact longs, and the normalizing division
    runs in DECIMAL(38,0) (`_norm_div`) so the h <= n*scale products
    cannot overflow. Long addition is associative/commutative, so the
    result is bit-identical across partitionings and engines — the
    DuckDB oracle replays the recursion and hash-matches.

    Scale shape (per iteration): TWO hash shuffles (groupBy dst, then
    groupBy src) over slim (node, long) contribution rows with map-side
    combine; the normalizing max is a 1-row aggregate broadcast back.
    No driver collect inside the loop; lineage is truncated per round
    with localCheckpoint(eager=False), same as pagerank.

    Returns (node, hub_micro, auth_micro) for every node in `edges`,
    after exactly n_iter rounds from the uniform h = scale start. The
    max hub and max authority are exactly `scale`; division remainders
    truncate (deterministic, never redistributed).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if use_local_checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = nodes.select(
        "node",
        F.lit(scale).cast("long").alias("h"),
        F.lit(0).cast("long").alias("a"),
    )
    for _ in range(n_iter):
        a_raw = (
            state.join(e, state["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("ar"))
        )
        amax = a_raw.agg(F.max("ar").alias("amax"))
        a_n = a_raw.crossJoin(F.broadcast(amax)).select(
            "node", F.expr(_norm_div("ar", "amax", scale)).alias("an")
        )
        h_raw = (
            a_n.join(e, a_n["node"] == e["dst"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("an").alias("hr"))
        )
        hmax = h_raw.agg(F.max("hr").alias("hmax"))
        h_n = h_raw.crossJoin(F.broadcast(hmax)).select(
            "node", F.expr(_norm_div("hr", "hmax", scale)).alias("hn")
        )
        state = (
            nodes.join(a_n, "node", "left")
            .join(h_n, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("hn"), F.lit(0)).cast("long").alias("h"),
                F.coalesce(F.col("an"), F.lit(0)).cast("long").alias("a"),
            )
        )
        if use_local_checkpoint:
            state = state.localCheckpoint(eager=False)
    return state.select(
        "node",
        F.col("h").alias("hub_micro"),
        F.col("a").alias("auth_micro"),
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle counting + local clustering coefficient over an
    undirected graph, via degree-ordered edge orientation (Suri &
    Vassilvitskii 2011, "Counting triangles and the curse of the last
    reducer" — the standard MapReduce shape).

    Web-curation uses: the host-graph clustering coefficient separates
    organic link neighborhoods (high closure) from spam farms and
    mirror rings (cliques -> coefficient ~1e6 ppm with high degree) and
    from pure hub/directory pages (near-zero closure); triangle density
    is also the basis of trust propagation and community detection
    preprocessing.

    Algorithm and why it scales:
    - Edges are canonicalized (self-loops dropped, (min,max) distinct),
      so the input order or duplication cannot change the answer.
    - Each undirected edge {u,v} is ORIENTED u->v iff (deg(u), u) <
      (deg(v), v) — a total order, so orientation is deterministic, and
      every node's OUT-degree is O(sqrt(m)): the wedge self-join below
      is O(m^1.5) total work instead of sum(deg^2), which at web scale
      is the difference between hours and never (a celebrity host with
      10^7 in-links contributes zero wedges from its own pivot).
    - Wedges (a<b out-neighbors of the same pivot) equi-join the
      oriented edge list on (a,b): each triangle is found EXACTLY once
      (at its lowest-order vertex's pivot). Three slim shuffles total:
      degree agg, wedge self-join, closing-edge join; all rows are
      (long, long) pairs — no payloads.
    - Per-node counts credit all three corners (explode, one hash agg);
      clustering coefficient is integer ppm: (2 * tri * 1e6) div
      (deg * (deg-1)), 0 where deg < 2 — exact, engine-portable.

    Returns (node, degree, n_triangles, clustering_ppm), one row per
    node that appears in any surviving edge.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .select(
            F.least("u", "v").alias("a"),
            F.greatest("u", "v").alias("b"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient by (degree, node): lower end points at higher end
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lt, F.col("a")).otherwise(F.col("b")).alias("o_src"),
            F.when(lt, F.col("b")).otherwise(F.col("a")).alias("o_dst"),
        )
    )
    # wedges from each pivot: unordered out-neighbor pairs, kept in the
    # same (degree, node) total order the orientation uses — which on the
    # oriented list is simply o_dst's own orientation order; re-derive it
    # by joining degrees on both legs of the wedge.
    w1 = oriented.select(F.col("o_src").alias("p"), F.col("o_dst").alias("x"))
    w2 = oriented.select(F.col("o_src").alias("p"), F.col("o_dst").alias("y"))
    dx = deg.select(F.col("node").alias("x"), F.col("degree").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("degree").alias("dy"))
    wedges = (
        w1.join(w2, "p")
        .join(dx, "x")
        .join(dy, "y")
        .filter(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
        .select("p", "x", "y")
    )
    closing = oriented.select(F.col("o_src").alias("x"), F.col("o_dst").alias("y"))
    tris = wedges.join(closing, ["x", "y"]).select("p", "x", "y")
    corners = (
        tris.select(F.col("p").alias("node"))
        .unionAll(tris.select(F.col("x").alias("node")))
        .unionAll(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(corners, "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
        )
        .withColumn(
            "clustering_ppm",
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "CAST((2 * n_triangles * 1000000) div (degree * (degree - 1)) AS BIGINT)"
                ),
            ).otherwise(F.lit(0).cast("long")),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration SYNCHRONOUS label propagation (Raghavan et al.
    2007) — community detection over the undirected link graph, the
    mesoscale complement to connected components (components.py finds
    reachability; LPA finds densely-linked clusters inside one
    component — mirror farms, forums, template families).

    Determinism (classic LPA is famously order-dependent; this variant
    is a pure function of the graph): updates are synchronous (every
    node reads the PREVIOUS round's labels), and the new label is the
    neighbor label with the highest count, ties broken by SMALLEST
    label. The node universe is EVERY distinct non-null endpoint in
    the input — a node with no neighbors after self-loop removal
    (isolated, or appearing only in self-loops) keeps its self-label
    and still emits a (node, node) row, so consumers joining labels
    back never see NULL communities. After exactly
    `n_iter` rounds from the self-label start, returns (node, label) —
    equal labels = same community. The q164 oracle replays the same
    recursion in SQL, so the distributed loop is pinned bit-exactly.

    Input edges are treated as UNDIRECTED: each pair is symmetrized;
    self-loops are dropped (a node never votes for itself — pure LPA).
    Known synchronous-LPA property (Raghavan et al. §3): bipartite-ish
    regions can oscillate with period 2 instead of converging; the
    fixed iteration count makes even that reproducible (the pytest
    pins one phase of a path graph's oscillation), and community
    consumers should treat labels from n_iter and n_iter+1 as equally
    valid partitions.

    Scale shape per round (Pregel-on-DataFrames, the pagerank pattern):
    one join of the label state onto the symmetrized edge list, one
    (node, label) count aggregation with map-side combine, one argmax
    aggregation — slim (node, label, count) rows only; the edge
    relation is localCheckpoint'd once up front so rounds never
    re-derive it, and the label state is checkpointed per round to
    truncate the iterative lineage (swap for checkpoint()/persist on a
    real cluster)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
    )
    sym = (
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    if use_local_checkpoint:
        sym = sym.localCheckpoint(eager=False)
    # seed from the UNFILTERED endpoint set: isolated / self-loop-only
    # nodes have no rows in `sym` but must still emit their self-label
    labels = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .where(F.col("node").isNotNull())
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(n_iter):
        nbr = sym.join(
            labels, sym["b"] == labels["node"], "inner"
        ).select(F.col("a").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        # argmax by (count desc, label asc) as ONE min-struct aggregate
        pick = cnt.groupBy("node").agg(
            F.min(
                F.struct((-F.col("c")).alias("nc"), F.col("label"))
            ).alias("m")
        ).select("node", F.col("m.label").alias("new_label"))
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
        if use_local_checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    n_iter: int = 10,
    damping_pct: int = 85,
    scale: int = 1_000_000_000_000,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration integer TrustRank (Gyöngyi, Garcia-Molina,
    Pedersen 2004) — personalized PageRank whose teleport mass lands
    ONLY on a hand-vetted seed set, so trust flows outward from known-
    good hosts and link-spam clusters that PageRank rewards (dense
    reciprocal farms) starve: spam demotion for the crawl frontier and
    corpus-quality priors.

    Identical exact-integer machinery to `pagerank` (associative long
    sums — partitioning-invariant, recursive-CTE replayable) with two
    changes: the per-round teleport `jump` goes to seed nodes only
    ((scale - damped) div n_seeds each, 0 elsewhere — uniform-over-
    seeds personalization), and the dangling mass redistributes over
    the SEED set, not all nodes (mass must never leak back to
    untrusted nodes through a sink). Start vector: scale div n_seeds
    on seeds, 0 elsewhere. Returns (node, trust_micro); nodes
    unreachable from the seed set hold exactly 0.

    Scale shape per iteration: same as pagerank — one contribution
    shuffle with map-side combine, broadcast dangling scalar, state
    checkpointed per round."""
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if use_local_checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    # seeds outside the edge universe still seed (isolated trusted
    # hosts are legal); union them into the node set
    nodes = nodes.unionAll(sd).distinct()
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n_seeds = sd.count()  # the one driver action besides pagerank's
    if n_seeds == 0:
        raise ValueError("seed set must be non-empty")

    jump_seed = (scale - (scale * damping_pct) // 100) // n_seeds
    ranks = (
        nodes.join(outdeg, "node", "left")
        .join(sd.withColumn("_s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("_s").isNotNull(), F.lit(scale // n_seeds))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("r"),
            "deg",
            F.coalesce("_s", F.lit(0)).alias("_s"),
        )
    )
    for _ in range(n_iter):
        contrib = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r div deg")).alias("c"))
        )
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("d")
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.when(
                        F.col("_s") == 1, F.lit(jump_seed)
                    ).otherwise(F.lit(0))
                    + F.expr(
                        f"((coalesce(c, 0L)"
                        f" + (case when _s = 1 then d div {n_seeds}"
                        f" else 0L end)) * {damping_pct}) div 100"
                    )
                ).cast("long").alias("r"),
                "deg",
                "_s",
            )
        )
        if use_local_checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("trust_micro"))
