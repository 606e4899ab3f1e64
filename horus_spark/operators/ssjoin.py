"""Exact all-pairs set-similarity join via prefix filtering (SSJoin /
AllPairs / PPJoin family: Chaudhuri et al. ICDE'06, Bayardo et al.
WWW'07, Xiao et al. WWW'08).

The third leg of the near-dup stack, next to LSH and the df-capped
inverted index:

- `minhash_dedup_pairs` (q21) is probabilistic: recall < 1 by design.
- `jaccard_pairs` (q11) is exact BUT prunes hot shingles from candidate
  generation (df > max_doc_freq), so clusters larger than the cap are
  not discoverable through them — a documented recall hole.
- THIS operator is exact with NO recall hole: the prefix-filter
  principle guarantees every pair with Jaccard >= t shares at least one
  token in their (short) prefixes, so indexing ONLY prefixes finds
  every qualifying pair, and the exact verify reports true similarity.

Prefix-filter principle: order all tokens by a GLOBAL total order
(document frequency ascending, token ascending — rarest first). For a
token set x sorted by that order, index only its first
|x| - ceil(t*|x|) + 1 tokens. If two sets share no indexed token, their
intersection lives entirely in the two suffixes of size ceil(t*|x|)-1 <
t*|x| <= t*|union| — so Jaccard < t, and skipping the pair is safe.
Rarest-first ordering makes prefixes maximally selective: frequent
(stopword-like) tokens land in suffixes and never generate candidates.

Why this scales where naive exact joins don't: the candidate join runs
over PREFIX tokens only — (1-t) of each set, made of the corpus's
rarest tokens, so bucket sizes are small by construction instead of by
a recall-losing cap. The size-ratio prefilter (t*|big| <= |small| is
necessary for J >= t) kills cross-size candidates before verification,
and verification explodes only docs that survive into a candidate pair
(semi-join prune), exactly like dedup._verify_pairs.

All thresholded arithmetic is integer ppm (ceil via (a*t_ppm + 999999)
div 1e6; the J >= t test as I * 1e6 >= t_ppm * (na + nb - I)) — no
float rounding at decision boundaries, so every engine and partitioning
agrees row-for-row and a SQL oracle can replay it.

The output Jaccard is also reported in exact ppm: (I * 1e6) div union.

Caveat shared with every exact all-pairs method: the OUTPUT itself is
quadratic in a mass-duplicated cluster (n identical docs = n(n-1)/2
pairs). Run `exact_dedup` first to collapse byte-identical copies; the
prefix filter then bounds the work of the fuzzy tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import tokens_expr


def token_sets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int | None = None,
) -> DataFrame:
    """Distinct (id, token) rows per document — the set representation
    the join runs over. n=None: whitespace words (repo convention);
    n>=2: word n-gram shingles (dedup.shingles — far more selective on
    templated corpora, where single-word vocabularies overlap heavily
    and the prefix filter would have nothing rare to index)."""
    if n is not None:
        from .dedup import shingles

        return (
            shingles(df, id_col=id_col, text_col=text_col, n=n)
            .withColumnRenamed("shingle", "token")
            .distinct()
        )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(
                    tokens_expr(F.coalesce(F.col(text_col), F.lit(""))),
                    lambda x: x != "",
                )
            ).alias("token"),
        )
        .distinct()
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int = 600_000,
    n: int | None = None,
) -> DataFrame:
    """All pairs with token-set Jaccard >= threshold_ppm/1e6, exactly.

    Returns (id_a, id_b, inter, union_, jaccard_ppm) with id_a < id_b.
    Shuffles: token df agg, per-doc rank window, prefix self-join,
    verify join — each over slim (id, token)/(id, id) rows.

    `n` selects the set representation (see token_sets): None =
    whitespace words, n>=2 = word n-gram shingles.
    """
    if not (0 < threshold_ppm <= 1_000_000):
        raise ValueError(
            f"threshold_ppm must be in (0, 1e6], got {threshold_ppm}"
        )
    tok = token_sets(df, id_col, text_col, n=n)
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df_"))
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    ranked = (
        tok.join(dfreq, "token")
        .join(sizes, "id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df_", "token")
            ),
        )
    )
    # ceil(t * sz) in exact integer ppm; prefix = sz - ceil(t*sz) + 1
    min_inter = F.expr(
        f"CAST((sz * {threshold_ppm} + 999999) div 1000000 AS BIGINT)"
    )
    prefix = ranked.filter(F.col("rn") <= F.col("sz") - min_inter + 1).select(
        "id", "token", "sz"
    )
    a = prefix.select(
        F.col("id").alias("id_a"), "token", F.col("sz").alias("na")
    )
    b = prefix.select(
        F.col("id").alias("id_b"), "token", F.col("sz").alias("nb")
    )
    cand = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        # size-ratio prefilter: J >= t forces t*max(na,nb) <= min(na,nb)
        .filter(
            F.greatest("na", "nb") * F.lit(threshold_ppm)
            <= F.least("na", "nb") * F.lit(1_000_000)
        )
        .select("id_a", "id_b", "na", "nb")
        .distinct()
    )
    # exact verify over full token sets, pruned to candidate docs only
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("cid")
    ).distinct()
    vtok = tok.join(cand_ids, F.col("id") == F.col("cid"), "left_semi")
    inter = (
        cand.join(vtok.select(F.col("id").alias("id_a"), "token"), "id_a")
        .join(
            vtok.select(F.col("id").alias("id_b"), F.col("token").alias("tb")),
            "id_b",
        )
        .filter(F.col("token") == F.col("tb"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn("union_", F.col("na") + F.col("nb") - F.col("inter"))
        # J >= t decided in exact integers: I * 1e6 >= t_ppm * union
        .filter(
            F.col("inter") * F.lit(1_000_000)
            >= F.lit(threshold_ppm) * F.col("union_")
        )
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("union_").cast("long").alias("union_"),
            F.expr("CAST((inter * 1000000) div union_ AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
    )
