"""IVF-PQ: product-quantized ANN — the quantization ladder's top rung.

The ANN tiers so far trade precision for I/O linearly: float32 (q25)
-> int8 (q39, 4x) -> 1-bit sign codes (q82, 32x but Hamming-only). PQ
(Jegou et al., the FAISS `IVFPQ` standard) gets ~32x compression while
keeping an inner-product-shaped score: split each vector into `m`
subspaces, quantize every subspace to one of `ksub` codewords, and
score query-to-code with an ADC table — per candidate only `m` integer
table lookups, no per-dimension math.

Pipeline (composing the q25/q39 machinery):
1. cells: the shuffle-free map-side nearest-centroid assignment
   (`similarity._assign_cells` — zero Exchange on corpus rows);
2. encode: per subspace, argmax-dot against `ksub` LITERAL codewords —
   another pure projection; the float payload is DROPPED, coarse rows
   carry (neighbor_id, cell, codes: array<int>) = m small ints;
3. probes: each query precomputes its ADC table — m x ksub integer
   micro-dots (round(dot * 1e6), the repo's order-deterministic sum
   pattern) — on the TINY query table, broadcast;
4. candidates: broadcast hash join on cell; ADC score = SUM of m
   integer lookups (exact, associative — no float-order hazard);
5. exact float rerank fetches full-precision vectors ONLY for the
   surviving rerank*k candidates.

Codebooks: `pq_codebooks(strategy="lowest_id")` slices the ksub
lowest-id vectors per subspace — the deterministic, oracle-replayable
baseline (the same stand-in convention as q25/q39's centroid choice);
any trained codebooks (e.g. per-subspace `operators.kmeans` runs) plug
into the same argument and the plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import (
    _assign_cells,
    _dot,
    _probe_cells,
    _resolve_centroids,
    cosine_expr,
)


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """codebooks[j][c] = subspace j of the c-th lowest-id embedding —
    a bounded TakeOrdered collect of ksub rows (deterministic,
    oracle-replayable). Swap in k-means-trained codewords of the same
    shape for recall; the scoring plan does not change."""
    rows = (
        embeddings.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"need >= {ksub} vectors, got {len(rows)}")
    d = len(rows[0]["v"])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    return [
        [[float(x) for x in r["v"][j * ds : (j + 1) * ds]] for r in rows]
        for j in range(m)
    ]


def _sub(vec: Column, j: int, ds: int) -> Column:
    return F.slice(vec, j * ds + 1, ds)


def _lit_vec(xs: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes: array<int>) — per subspace, the argmax-dot codeword
    index (round-6 dots; first-max = lowest code wins ties). Pure
    map-side projection, zero shuffle."""
    m, ksub = len(codebooks), len(codebooks[0])
    ds = len(codebooks[0][0])
    vec = F.col(vec_col).cast("array<double>")
    codes = []
    for j in range(m):
        dots = F.array(
            *[
                F.round(_dot(_sub(vec, j, ds), _lit_vec(codebooks[j][c])), 6)
                for c in range(ksub)
            ]
        )
        codes.append(
            F.coalesce(
                (F.array_position(dots, F.array_max(dots)) - 1).cast("int"),
                F.lit(0),
            )
        )
    return embeddings.select(
        F.col(id_col).alias("id"), F.array(*codes).alias("codes")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    rerank: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | str = "kmeans",
) -> DataFrame:
    """IVF-PQ ANN: cell-pruned candidate generation over m-byte PQ
    codes, integer ADC ordering, exact float rerank. Returns
    (q_id, neighbor_id, rank, score). `queries` needs (q_id, q_vec)."""
    m, ksub = len(codebooks), len(codebooks[0])
    ds = len(codebooks[0][0])
    cents = _resolve_centroids(
        embeddings, centroids, n_centroids, id_col, vec_col
    )
    # coarse rows: cell + codes in ONE projection; float payload dropped
    assigned = _assign_cells(embeddings, cents, id_col, vec_col)
    codes = []
    for j in range(m):
        dots = F.array(
            *[
                F.round(
                    _dot(_sub(F.col("vec"), j, ds), _lit_vec(codebooks[j][c])),
                    6,
                )
                for c in range(ksub)
            ]
        )
        codes.append(
            F.coalesce(
                (F.array_position(dots, F.array_max(dots)) - 1).cast("int"),
                F.lit(0),
            )
        )
    qe = assigned.select(
        "neighbor_id", "cell", F.array(*codes).alias("codes")
    )
    # probes: per query the ADC table — m x ksub INTEGER micro-dots
    # (round(dot*1e6): exact integer sums, no float-order hazard)
    probes = _probe_cells(queries, cents, n_probe)
    qv = F.col("q_vec").cast("array<double>")
    adc_tab = F.array(
        *[
            F.array(
                *[
                    F.round(
                        _dot(_sub(qv, j, ds), _lit_vec(codebooks[j][c]))
                        * 1_000_000
                    ).cast("long")
                    for c in range(ksub)
                ]
            )
            for j in range(m)
        ]
    )
    probes = probes.select("q_id", "cell", adc_tab.alias("adc"))
    # candidates: broadcast join on cell; score = m integer lookups
    score = None
    for j in range(m):
        term = F.element_at(
            F.element_at(F.col("adc"), j + 1),
            F.element_at(F.col("codes"), j + 1) + 1,
        )
        score = term if score is None else score + term
    cand = (
        qe.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .withColumn("adc_score", score)
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    top_m = (
        cand.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= rerank * k)
        .select("q_id", "neighbor_id")
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    q = queries.select(
        "q_id", F.col("q_vec").cast("array<double>").alias("q_vec")
    )
    scored = (
        top_m.join(e, "neighbor_id")
        .join(F.broadcast(q), "q_id")
        .withColumn(
            "score", F.round(cosine_expr(F.col("vec"), F.col("q_vec")), 6)
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "score")
    )
