"""Deduplication operators for web-scale corpora.

Four tiers, each a standard large-corpus technique:
- exact:    content-hash groupBy (the reference's MD5 thumbprint dedup,
            reference Horus.Functions/DocumentProcessor.cs:212-224 + faq.md)
- ngram-jaccard: word-shingle inverted index -> candidate pairs sharing a
            shingle -> exact Jaccard >= threshold (exactly SQL-expressible,
            used as the verification oracle for the sketch tiers)
- minhash-LSH: k universal-hash permutations of one md5-derived base hash
            -> banded signatures -> bucket join -> candidates verified by
            exact Jaccard (the at-scale path: candidate generation is
            linear in corpus size, never all-pairs). The permutation family
            (a_i*h + b_i) mod (2^31-1) over a 28-bit md5 prefix is chosen
            so every step is expressible in ANSI SQL for oracle parity —
            and it is CHEAPER than k seeded xxhash64 calls (one digest +
            k integer ops per shingle).
- simhash:  sign-aggregated token hashes + hamming threshold

Scale notes: shingle explode is the only wide stage; the inverted-index
join co-partitions on the shingle hash. Hot shingles (document frequency >
max_doc_freq) are pruned from candidate generation — the stopword-shingle
guard that bounds the worst join key's fanout (skew control).

CAVEAT (real, by construction): a near-duplicate CLUSTER with more than
max_doc_freq members makes every shingle its members share hot, so the
whole cluster is silently dropped from candidate generation — the exact
mass-duplication case dedup exists for. At scale, run exact_dedup FIRST
and feed only canonical ids into the fuzzy tiers (collapsing exact clones
is what keeps document frequencies honest); set log_pruned=True to count
what the guard dropped.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# universal-hash modulus: Mersenne prime 2^31-1. Base hash is 28 bits
# (7 hex chars of md5), a_i < 2^31, so a_i*h < 2^59 — no 64-bit overflow in
# either Spark or the SQL oracle.
MINHASH_PRIME = 2147483647


def minhash_params(k: int, seed: int = 1337) -> tuple[list[int], list[int]]:
    """Seeded (a, b) coefficient lists for the k permutations."""
    rng = np.random.RandomState(seed)
    a = [int(x) for x in rng.randint(1, MINHASH_PRIME - 1, size=k)]
    b = [int(x) for x in rng.randint(0, MINHASH_PRIME, size=k)]
    return a, b


def _shingle_array(text_col: str, n: int) -> "F.Column":
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)])
    )
    # CASE WHEN is lazily evaluated per row, so the sequence expression
    # (invalid when size < n: descending [0..size-n] would index past the
    # array under ANSI mode) only runs on docs long enough to shingle;
    # shorter docs get an empty shingle set instead of a runtime error.
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    return df.select(
        F.col(id_col).alias("id"), F.explode(_shingle_array(text_col, n)).alias("shingle")
    )


def shingle_sizes(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, n_sh): distinct-shingle count per doc WITHOUT the explode —
    a per-row size() expression, no shuffle at all."""
    return df.select(
        F.col(id_col).alias("id"), F.size(_shingle_array(text_col, n)).alias("n_sh")
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: every row keyed by its thumbprint with
    the canonical (minimum) id and the duplicate-group size.

    NULL-text rows get thumbprint NULL and stand as their own singleton
    groups (canonical = self, is_duplicate = false). They must not
    vanish: md5(NULL) is NULL and an inner join on the thumbprint never
    matches NULL keys, so the original inner-join shape silently DROPPED
    null-text docs from the output — and therefore from
    dedup_pipeline's surviving corpus (review finding, confirmed by
    execution). Nor should they group together: two absent texts are
    not byte-identical content."""
    h = df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("thumbprint"))
    groups = h.filter(F.col("thumbprint").isNotNull()).groupBy("thumbprint").agg(
        F.min("id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return h.join(groups, "thumbprint", "left").select(
        "id",
        "thumbprint",
        F.coalesce("canonical_id", "id").alias("canonical_id"),
        F.coalesce(
            F.col("id") != F.col("canonical_id"), F.lit(False)
        ).alias("is_duplicate"),
    )


def _pair_intersections(
    cand: DataFrame, df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Exact shared-shingle counts for candidate pairs carrying sizes:
    (id_a, id_b, na, nb) -> + inter. The verification explode covers ONLY
    docs appearing in a surviving candidate pair (semi-join prune) —
    candidates << corpus, so the exploded joins touch a sliver of the
    data. ONE consumption of the candidate subtree for the id set: a
    union of two selects would execute the whole upstream candidate
    pipeline (LSH signatures or inverted index) twice more — column
    pruning makes the two branches different subplans, so ReuseExchange
    cannot merge them; explode(array(...)) reads candidates once."""
    cand_ids = (
        cand.select(F.explode(F.array("id_a", "id_b")).alias("cid")).distinct()
    )
    sh = shingles(
        df.join(cand_ids, F.col(id_col) == F.col("cid"), "left_semi"),
        id_col,
        text_col,
        n,
    )
    return (
        cand.select("id_a", "id_b", "na", "nb")
        .join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("shingle").alias("shingle_b")),
            "id_b",
        )
        .filter(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )


def _verify_pairs(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs over the
    FULL shingle sets. Scale shape:
    - per-doc sizes come from a size() EXPRESSION (no explode, no shuffle);
    - a size-ratio prefilter (jaccard <= min/max) kills pairs that cannot
      reach the threshold before any join on shingles;
    - the verification explode covers ONLY docs that appear in a surviving
      candidate pair (semi-join prune) — candidates << corpus, so the
      expensive exploded joins touch a sliver of the data."""
    sizes = shingle_sizes(df, id_col, text_col, n)
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    cand = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.least("na", "nb") >= threshold * F.greatest("na", "nb"))
    )
    inter = _pair_intersections(cand, df, id_col, text_col, n)
    return (
        inter.withColumn(
            "jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int = 256,
    log_pruned: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard, generated via a
    shingle inverted index (no all-pairs cross join). Returns
    (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6dp.

    Hot shingles (document frequency > max_doc_freq) are pruned from
    CANDIDATE GENERATION only; surviving pairs are re-verified exactly over
    the full shingle sets, so reported jaccard values are exact. See the
    module docstring for the duplicate-cluster caveat this pruning carries
    and the exact_dedup-first mitigation. This exact tier is the small-sf
    oracle-parity query; the headline/at-scale near-dup path is
    minhash_dedup_pairs."""
    sh = shingles(df, id_col, text_col, n)
    # prune hot shingles (stopword-shingle guard == skew control)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    if log_pruned:
        import warnings

        n_hot = freq.filter(F.col("df_") > max_doc_freq).count()
        if n_hot:
            warnings.warn(
                f"jaccard_pairs: pruned {n_hot} hot shingles (df > {max_doc_freq}) "
                "from candidate generation; clusters larger than max_doc_freq are "
                "not discoverable through them — run exact_dedup first",
                stacklevel=2,
            )
    pruned = sh.join(freq.filter(F.col("df_") <= max_doc_freq), "shingle")
    pairs = (
        pruned.alias("a")
        .join(pruned.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _verify_pairs(pairs, df, id_col, text_col, n, threshold)


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 256,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT near-dup pairs (Broder 1997's
    second resemblance measure): C(a⊂b) = |S(a) ∩ S(b)| / |S(a)| and the
    mirror C(b⊂a); a pair is kept when EITHER side >= threshold. This
    catches subset/superset duplication that Jaccard structurally
    misses — a 100-shingle doc embedded verbatim in a 10,000-shingle
    page has jaccard ≈ 0.01 but containment 1.0 (quoted articles,
    boilerplate-wrapped reposts, partial crawl re-fetches).

    Returns (id_a, id_b, containment_a, containment_b) with id_a < id_b,
    both ratios rounded to 6dp; containment_a = fraction of a's shingles
    found in b. Candidate generation is jaccard_pairs' pruned inverted
    index (hot shingles with doc-frequency > max_doc_freq dropped from
    CANDIDATES only; verification is exact over full shingle sets).
    Deliberately NO size-ratio prefilter — wildly different sizes are
    exactly the regime containment exists for. Exact-tier oracle query
    at small sf; at 100 TB compose behind exact_dedup-first like the
    other inverted-index tiers (the hot-shingle caveat in the module
    docstring applies unchanged)."""
    sh = shingles(df, id_col, text_col, n)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    pruned = sh.join(freq.filter(F.col("df_") <= max_doc_freq), "shingle")
    pairs = (
        pruned.alias("a")
        .join(pruned.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sizes = shingle_sizes(df, id_col, text_col, n)
    cand = pairs.join(
        sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a"
    ).join(
        sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b"
    )
    inter = _pair_intersections(cand, df, id_col, text_col, n)
    # threshold on the UNROUNDED ratios (the 6dp rounding is display-only;
    # filtering on rounded values would admit pairs the exact math rejects)
    ca = F.col("inter") / F.col("na")
    cb = F.col("inter") / F.col("nb")
    return (
        inter.filter(F.greatest(ca, cb) >= F.lit(float(threshold)))
        .select(
            "id_a",
            "id_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


def minhash_base_hash() -> "F.Column":
    """28-bit base hash of a shingle: first 7 hex chars of md5 — the single
    digest all k permutations derive from (SQL-parity with
    CAST(concat('0x', substring(md5(shingle),1,7)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(F.col("shingle")), 1, 7), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    seed: int = 1337,
) -> DataFrame:
    """k-permutation MinHash signatures: (id, sig array<long>[k])."""
    a, b = minhash_params(k, seed)
    sh = shingles(df, id_col, text_col, n).withColumn("h", minhash_base_hash())
    mins = sh.groupBy("id").agg(
        *[
            F.min((F.lit(a[i]) * F.col("h") + F.lit(b[i])) % F.lit(MINHASH_PRIME)).alias(f"h{i}")
            for i in range(k)
        ]
    )
    return mins.select("id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def _band_buckets(signatures: DataFrame, bands: int) -> DataFrame:
    """(id, band, bucket) banding projection of (id, sig) — the band's
    value string is the bucket (not re-hashed) so SQL oracles reproduce
    candidate sets exactly. Callers validate bands against k."""
    rows_per_band = F.floor(F.size("sig") / bands).cast("int")
    return signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), (b * rows_per_band + 1).cast("int"), rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, k: int | None = None
) -> DataFrame:
    """Band the signatures and bucket-join: docs sharing any band bucket are
    candidates. Buckets are the band's value string (not re-hashed) so the
    SQL oracle reproduces candidate sets exactly. (id_a < id_b distinct.)

    `k` (the signature length) is validated when given: bands must
    divide k, and bands > k is an error — with rows_per_band floored to
    0 every bucket would be the empty string and the self-join would
    silently degenerate to ALL-PAIRS, the exact O(n^2) explosion LSH
    exists to prevent (review finding, confirmed by execution). Callers
    going through minhash_dedup_pairs always pass k."""
    if k is not None:
        if bands > k:
            raise ValueError(
                f"bands={bands} > signature length k={k}: every band "
                "bucket would be empty and candidates degenerate to "
                "all-pairs"
            )
        if k % bands != 0:
            raise ValueError(
                f"bands={bands} must divide the signature length k={k} "
                f"({k % bands} hashes would be silently ignored)"
            )
    banded = _band_buckets(signatures, bands)
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 1337,
    staging_dir: str | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: LSH candidates verified by exact
    Jaccard (verify step keeps precision exact; LSH bounds the candidate
    set so nothing is all-pairs). This is the 100 TB near-dup path — no
    inverted-index self-join over raw shingles, so hot shingles cannot fan
    out, and the bucket join's worst key is a band collision group.

    `staging_dir` (recommended for production runs): the candidate pair
    set feeds THREE verify consumers (id prune + both join legs), and
    column pruning makes their subplans differ, so pure-lazy execution
    re-runs the whole shingle->signature->banding pipeline per consumer.
    Passing a directory stages candidates to parquet ONCE and verify
    reads them back — the same stage-once pattern as the checkpointed
    sink. Left off by default so the operator stays side-effect-free
    (benches/oracles measure the honest single-pass cost)."""
    sigs = minhash_signatures(df, id_col, text_col, n, k, seed)
    cand = lsh_candidate_pairs(sigs, bands, k=k)
    if staging_dir is not None:
        import os

        path = os.path.join(staging_dir, "minhash_candidates")
        cand.write.mode("overwrite").parquet(path)
        cand = df.sparkSession.read.parquet(path)
    return _verify_pairs(cand, df, id_col, text_col, n, threshold)


def dedup_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 1337,
    log_collapsed: bool = False,
    staging_dir: str | None = None,
) -> dict:
    """The documented at-scale dedup recipe composed into ONE operator —
    the module-docstring mass-duplication caveat made executable:

    1. exact_dedup collapses byte-identical clones to canonical ids. This
       is what keeps the fuzzy tier honest under mass duplication: a
       cluster with more members than max_doc_freq makes every shingle its
       members share hot — raw jaccard_pairs prunes those shingles and
       silently drops the whole cluster (tests/test_dedup_pipeline.py
       proves the drop), and even minhash-LSH would put all clones in the
       same band buckets, exploding candidate pairs quadratically in the
       cluster size.
    2. minhash_dedup_pairs (the 100 TB near-dup tier) runs over CANONICAL
       REPRESENTATIVES only — document frequencies and bucket sizes now
       reflect distinct content, so no cluster can out-grow the guards.

    A near-dup of a mass-duplicated page is therefore still found: once
    against the canonical representative, recoverable for every clone via
    exact.canonical_id.

    Returns {"exact": (id, thumbprint, canonical_id, is_duplicate),
             "canonical_docs": df rows whose id is canonical,
             "fuzzy_pairs": (id_a, id_b, jaccard) over canonical ids,
             "collapsed_count": lazy frame with one `n_collapsed` row}.

    LAZY throughout: composing the pipeline launches NO Spark job — at
    100 TB an eager clone-count here would be a second corpus-scale pass
    before any useful work. The collapsed-clone counter the old
    `log_collapsed=True` default computed eagerly is now the returned
    `collapsed_count` one-row frame, priced only when the caller acts on
    it; set log_collapsed=True to opt back into the eager warn (documented
    as an extra job, mirroring jaccard_pairs.log_pruned)."""
    exact = exact_dedup(df, id_col, text_col)
    collapsed = exact.agg(
        F.sum(F.col("is_duplicate").cast("long")).alias("n_collapsed")
    )
    if log_collapsed:
        import warnings

        n_dup = collapsed.collect()[0].n_collapsed or 0
        if n_dup:
            warnings.warn(
                f"dedup_pipeline: exact tier collapsed {n_dup} clone rows "
                "into their canonical ids before the fuzzy tier",
                stacklevel=2,
            )
    canonical = df.join(
        exact.filter(~F.col("is_duplicate")).select(F.col("id").alias(id_col)),
        id_col,
        "left_semi",
    )
    fuzzy = minhash_dedup_pairs(
        canonical, id_col, text_col, n, k, bands, threshold, seed,
        staging_dir=staging_dir,
    )
    return {
        "exact": exact,
        "canonical_docs": canonical,
        "fuzzy_pairs": fuzzy,
        "collapsed_count": collapsed,
    }


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs at scale: split each fingerprint into
    `bands` contiguous bit blocks and bucket-join per block — by
    pigeonhole, any pair with hamming distance <= bands-1 shares at least
    one exact block, so with the default 4 bands / max_hamming 3 recall is
    EXACT (not probabilistic); candidates are then verified with
    bit_count(xor). Returns (id_a, id_b, hamming) with id_a < id_b.
    Requires max_hamming <= bands - 1 for the exactness guarantee."""
    if max_hamming > bands - 1:
        raise ValueError("exactness requires max_hamming <= bands - 1")
    if bands > bits:
        # block = bits // bands would floor to 0 and mask to 0: every
        # fingerprint buckets to 0 in every band and the join silently
        # degenerates to all-pairs (the lsh_candidate_pairs failure
        # mode; review finding)
        raise ValueError(f"bands={bands} > bits={bits}: bands must be <= bits")
    if bits % bands != 0:
        raise ValueError(
            f"bands={bands} must divide bits={bits} "
            f"({bits % bands} bits would be silently ignored)"
        )
    sig = simhash(df, id_col, text_col, bits)
    block = bits // bands
    mask = (1 << block) - 1
    banded = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * block)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 56) -> DataFrame:
    """SimHash fingerprints: per-token md5-derived bit vectors, sign-summed.
    Uses the top `bits` of md5 (as a 14-hex-digit int) so the same value is
    computable in ANSI SQL for oracle parity. Returns (id, simhash:long)."""
    toks = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("tok")
    base = df.select(F.col(id_col).alias("id"), toks)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 14), 16, 10).cast("long")
    base = base.select("id", h.alias("h"))
    agg = base.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select("id", sim.alias("simhash"))


def build_dedup_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    seed: int = 1337,
) -> DataFrame:
    """Persistable corpus fingerprint for INCREMENTAL dedup:
    (id, content_md5, sig array<long>[k]).

    ~0.6 KB/doc regardless of document size — at 10^12 documents the
    index is a few hundred GB of parquet, so a new crawl batch can be
    deduplicated against the whole corpus without ever re-reading the
    corpus TEXT. Docs too short to shingle (< n tokens) carry a NULL
    sig and participate only in the exact tier; NULL-text docs carry a
    NULL content_md5 and never exact-match anything (the exact_dedup
    singleton convention)."""
    base = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )
    sigs = minhash_signatures(df, id_col, text_col, n, k, seed)
    return base.join(sigs, "id", "left")


def incremental_dedup(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.3,
    seed: int = 1337,
) -> DataFrame:
    """Deduplicate a NEW batch against an existing corpus index
    (build_dedup_index output) WITHOUT touching the corpus text — the
    production shape for continuous ingestion: per-batch cost is
    O(batch + matched index slice), never O(corpus).

    Verdict per batch doc, first tier that fires wins:
      exact_existing  content_md5 matches an indexed doc
      exact_batch     content_md5 matches a smaller-id batch doc
      near_existing   shares an LSH band bucket with an indexed doc and
                      signature agreement >= ceil(threshold*k)/k
      near_batch      same vs a smaller-id batch doc
      unique          none of the above
    partner_id = the smallest qualifying id in the verdict's tier.

    Near verification uses the SIGNATURE-estimated Jaccard (fraction of
    agreeing minhash components) as an integer compare (matches >=
    ceil(threshold*k)) — deterministic, SQL-expressible, and the only
    option when the corpus text is not at hand; k bounds the estimator's
    resolution at 1/k. Near tiers run only over docs the exact tiers
    left unresolved (exact clones are collapsed first — the same
    frequency-honesty argument as dedup_pipeline).

    Returns (doc_id, verdict, partner_id). Extend the index with
    extend_dedup_index before ingesting the next batch.
    """
    bidx = build_dedup_index(batch, id_col, text_col, n, k, seed)
    return incremental_verdicts(bidx, index, k=k, bands=bands, threshold=threshold)


def incremental_verdicts(
    bidx: DataFrame,
    index: DataFrame,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.3,
) -> DataFrame:
    """The tiered incremental-dedup core over PRE-BUILT index frames —
    both sides (id, content_md5, sig array<long>[k]), where content_md5
    is ANY per-document content digest and sig any k-long minhash
    signature (NULL sig = exact tier only). incremental_dedup wraps
    this for text corpora; interleave.incremental_multimodal_dedup for
    interleaved span corpora (digest = the multimodal fingerprint, sig
    over span-content token sets). Tier semantics, partner rule, and
    the integer signature-agreement verify are as documented on
    incremental_dedup."""
    if bands > k:
        raise ValueError(f"bands={bands} > signature length k={k}")
    if k % bands != 0:
        raise ValueError(f"bands={bands} must divide k={k}")
    min_matches = -(-int(threshold * k * 1000000) // 1000000)  # ceil w/o float ulp
    eidx = index.select("id", "content_md5", "sig")

    # exact tiers (digest join: a NULL digest never matches)
    t1 = (
        bidx.join(
            eidx.select(F.col("id").alias("eid"), "content_md5"), "content_md5"
        )
        .groupBy("id")
        .agg(F.min("eid").alias("p1"))
    )
    # within-batch exact tier: partner = the digest group's min id, via
    # groupBy-min + join-back (O(group)) — NOT a digest self-join, whose
    # per-group fan-out is O(group^2) and explodes on a duplicate-heavy
    # batch (a crawl re-fetching one hot page ships every pair).
    b_md5 = bidx.select("id", "content_md5")
    gmin = b_md5.groupBy("content_md5").agg(F.min("id").alias("_gmin"))
    t2 = (
        b_md5.join(gmin, "content_md5")
        .filter(F.col("id") > F.col("_gmin"))
        .select("id", F.col("_gmin").alias("p2"))
    )

    # near tiers over exact-unresolved batch docs with signatures
    resolved = t1.select("id").union(t2.select("id")).distinct()
    open_sigs = (
        bidx.filter(F.col("sig").isNotNull())
        .join(resolved, "id", "left_anti")
        .select("id", "sig")
    )
    nb = _band_buckets(open_sigs, bands)
    eb = _band_buckets(eidx.filter(F.col("sig").isNotNull()).select("id", "sig"), bands)

    def _verified(cand: DataFrame, left_sigs: DataFrame, right_sigs: DataFrame) -> DataFrame:
        sl = left_sigs.select(F.col("id").alias("nid"), F.col("sig").alias("sig_n"))
        sr = right_sigs.select(F.col("id").alias("pid"), F.col("sig").alias("sig_p"))
        agree = F.aggregate(
            F.zip_with("sig_n", "sig_p", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        return (
            cand.join(sl, "nid").join(sr, "pid")
            .withColumn("agree", agree)
            .filter(F.col("agree") >= F.lit(min_matches))
            .select("nid", "pid")
        )

    cand3 = (
        nb.alias("n")
        .join(eb.alias("e"), ["band", "bucket"])
        .select(F.col("n.id").alias("nid"), F.col("e.id").alias("pid"))
        .distinct()
    )
    t3 = (
        _verified(cand3, open_sigs, eidx)
        .groupBy(F.col("nid").alias("id"))
        .agg(F.min("pid").alias("p3"))
    )
    cand4 = (
        nb.alias("a")
        .join(nb.alias("b"), ["band", "bucket"])
        .filter(F.col("b.id") < F.col("a.id"))
        .select(F.col("a.id").alias("nid"), F.col("b.id").alias("pid"))
        .distinct()
    )
    t4 = (
        _verified(cand4, open_sigs, open_sigs)
        .groupBy(F.col("nid").alias("id"))
        .agg(F.min("pid").alias("p4"))
    )

    out = (
        bidx.select("id")
        .join(t1, "id", "left")
        .join(t2, "id", "left")
        .join(t3, "id", "left")
        .join(t4, "id", "left")
    )
    verdict = (
        F.when(F.col("p1").isNotNull(), F.lit("exact_existing"))
        .when(F.col("p2").isNotNull(), F.lit("exact_batch"))
        .when(F.col("p3").isNotNull(), F.lit("near_existing"))
        .when(F.col("p4").isNotNull(), F.lit("near_batch"))
        .otherwise(F.lit("unique"))
    )
    return out.select(
        F.col("id").alias("doc_id"),
        verdict.alias("verdict"),
        F.coalesce("p1", "p2", "p3", "p4").alias("partner_id"),
    )


def extend_dedup_index(
    index: DataFrame,
    batch: DataFrame,
    verdicts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    seed: int = 1337,
) -> DataFrame:
    """index ∪ fingerprints of the batch docs judged `unique` — the
    append that keeps the rolling index canonical (duplicates never
    enter it, so its per-doc frequencies stay honest across batches).
    Persist the result (or just append the new slice) before the next
    incremental_dedup call."""
    uniq = verdicts.filter(F.col("verdict") == "unique").select(
        F.col("doc_id").alias("id")
    )
    fresh = build_dedup_index(batch, id_col, text_col, n, k, seed).join(uniq, "id")
    return index.select("id", "content_md5", "sig").unionByName(fresh)


def minhash_signatures_from_tokens(
    tokens: DataFrame, k: int = 64, seed: int = 1337
) -> DataFrame:
    """k-permutation MinHash signatures over a PRE-BUILT token frame
    (id, shingle) — the generic core of minhash_signatures for callers
    whose tokens are not word n-grams of a text column (e.g. the
    interleaved-span content tokens of
    interleave.multimodal_minhash_pairs). Same universal-hash family and
    28-bit md5 base hash as the text path, so SQL oracles built for one
    replay the other. Returns (id, sig array<long>[k])."""
    a, b = minhash_params(k, seed)
    bh = tokens.withColumn("h", minhash_base_hash())
    mins = bh.groupBy("id").agg(
        *[
            F.min(
                (F.lit(a[i]) * F.col("h") + F.lit(b[i])) % F.lit(MINHASH_PRIME)
            ).alias(f"h{i}")
            for i in range(k)
        ]
    )
    return mins.select("id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def verify_token_pairs(
    candidates: DataFrame, tokens: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs over a
    pre-built DISTINCT token frame (id, shingle) — the token-frame
    analog of _verify_pairs, same scale shape: per-doc sizes first, a
    size-ratio prefilter kills pairs that cannot reach the threshold,
    then the intersection joins touch only docs surviving in some
    candidate pair (semi-join prune). Returns (id_a, id_b, jaccard)."""
    sizes = tokens.groupBy("id").agg(F.count("*").alias("n_sh"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    cand = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.least("na", "nb") >= threshold * F.greatest("na", "nb"))
    )
    cand_ids = (
        cand.select(F.explode(F.array("id_a", "id_b")).alias("cid")).distinct()
    )
    sh = tokens.join(cand_ids, tokens["id"] == F.col("cid"), "left_semi")
    inter = (
        cand.select("id_a", "id_b", "na", "nb")
        .join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(
            sh.select(
                F.col("id").alias("id_b"), F.col("shingle").alias("shingle_b")
            ),
            "id_b",
        )
        .filter(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
