"""Interleaved-span corpus operators over the north-rule span shape
(spans: array<struct<kind,text,media_ref,offset>>).

Interleaved text+media documents are the input contract of this engine
(reference: nikkh/Horus processes scanned-form documents whose pages mix
text runs with embedded media; see Models/Document.cs for the per-page
word/line structure). This module covers what a multimodal training-data
pipeline needs beyond the plain-text operators, in two families:

- MAP-SIDE analytics and rewrites — structure stats, caption-pair
  mining (LAION/MMC4-style), token costs, span PII redaction, window
  segmentation: pure array expressions (array_sort comparator +
  transform/filter/aggregate lambdas are JVM expressions, not Python),
  ZERO shuffles, zero UDFs; output inherits the scan's partitioning, so
  at 10^12 documents these are scan-bound.
- CONTENT-ADDRESSED dedup and asset management — multimodal
  fingerprints (exact tier), token-set minhash (fuzzy tier), the
  incremental index, asset dedup + ref rewrite, the referential audit:
  these DO shuffle, but only slim rows — text is digested map-side in
  the explode projection and media participates by sha256, so raw text
  and payload bytes never cross an Exchange. Per-operator docstrings
  state each plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _by_offset(col: Column) -> Column:
    """Sort a spans array by its offset field (array_sort's default struct
    ordering would compare `kind` first, which is wrong)."""
    return F.array_sort(
        col,
        lambda l, r: (
            F.when(l["offset"] < r["offset"], F.lit(-1))
            .when(l["offset"] > r["offset"], F.lit(1))
            .otherwise(F.lit(0))
        ),
    )


def _tok_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank/NULL (split('') is [''];
    an uncoalesced NULL would poison any fold it feeds — acc + NULL is
    NULL, silently nulling a whole document's aggregate)."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def interleave_stats(
    spans_df: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Per-document modality-structure stats over an interleaved spans
    array: span/text/media counts, modality transitions (adjacent pairs
    whose text-vs-media category differs, in offset order), the longest
    run of consecutive text spans, and total text characters.

    Single map-side pass per document: one array_sort + three aggregate
    folds — no shuffle, no Python. Documents with an empty spans array
    get an all-zeros row (they are still documents; dropping them would
    silently shrink downstream joins)."""
    arr = _by_offset(F.col(spans_col))
    is_text = lambda s: s["kind"] == F.lit("text")  # noqa: E731

    # modality transitions: fold carrying (prev category, count)
    trans = F.aggregate(
        arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"), F.lit(0).alias("n")
        ),
        lambda acc, s: F.struct(
            F.when(is_text(s), F.lit("T")).otherwise(F.lit("M")).alias("prev"),
            (
                acc["n"]
                + F.when(
                    acc["prev"].isNotNull()
                    & (
                        acc["prev"]
                        != F.when(is_text(s), F.lit("T")).otherwise(F.lit("M"))
                    ),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n"),
        ),
        lambda acc: acc["n"],
    )

    # longest consecutive-text run: fold carrying (current run, best run)
    max_run = F.aggregate(
        arr,
        F.struct(F.lit(0).alias("cur"), F.lit(0).alias("best")),
        lambda acc, s: F.struct(
            F.when(is_text(s), acc["cur"] + 1).otherwise(F.lit(0)).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(is_text(s), acc["cur"] + 1).otherwise(F.lit(0)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )

    text_chars = F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(
            is_text(s),
            # coalesce: a NULL text would null the fold for the whole doc
            F.length(F.coalesce(s["text"], F.lit(""))).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )

    return spans_df.select(
        F.col(id_col),
        F.size(arr).alias("n_spans"),
        F.size(F.filter(arr, is_text)).alias("n_text"),
        F.size(F.filter(arr, lambda s: ~is_text(s))).alias("n_media"),
        trans.alias("n_transitions"),
        max_run.alias("max_text_run"),
        text_chars.alias("text_chars"),
    )


def caption_pairs(
    spans_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    min_tokens: int = 1,
    max_tokens: int = 256,
) -> DataFrame:
    """Mine (media_ref, caption) training pairs from interleaved spans:
    for every media span, the caption candidate is the IMMEDIATELY
    PRECEDING span if it is text, else the immediately following span if
    it is text, else the media span yields no pair (adjacency in offset
    order — the MMC4/LAION heuristic that alt-text-adjacent prose is the
    best caption source). Candidates are then filtered to
    [min_tokens, max_tokens] whitespace tokens.

    Selection happens BEFORE the length filter: a media span whose
    preceding text span is too short yields no pair (it does not fall
    through to the following span) — the adjacency rule picks the
    candidate, the bounds judge it.

    Pure map-side array expressions (get/transform/filter lambdas) —
    zero shuffle, zero Python. Output: (id, media_ref, media_kind,
    caption, cap_src in {'before','after'}, n_cap_tokens)."""
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    if max_tokens < min_tokens:
        raise ValueError(
            f"max_tokens={max_tokens} < min_tokens={min_tokens}"
        )
    arr = _by_offset(F.col(spans_col))
    # one slot per array position carrying (self, prev, next); F.get is
    # total (NULL out of range), so edges need no special cases
    idx = F.when(F.size(arr) > 0, F.sequence(F.lit(0), F.size(arr) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    slots = F.transform(
        idx,
        lambda i: F.struct(
            F.get(arr, i).alias("s"),
            F.get(arr, i - 1).alias("p"),
            F.get(arr, i + 1).alias("n"),
        ),
    )
    media = F.filter(slots, lambda c: c["s"]["kind"] != F.lit("text"))
    cands = F.transform(
        media,
        lambda c: F.struct(
            c["s"]["media_ref"].alias("media_ref"),
            c["s"]["kind"].alias("media_kind"),
            # NULL-struct field access is NULL, so a missing neighbour
            # simply fails both whens -> NULL caption -> filtered below
            F.when(c["p"]["kind"] == F.lit("text"), c["p"]["text"])
            .when(c["n"]["kind"] == F.lit("text"), c["n"]["text"])
            .alias("caption"),
            F.when(c["p"]["kind"] == F.lit("text"), F.lit("before"))
            .when(c["n"]["kind"] == F.lit("text"), F.lit("after"))
            .alias("cap_src"),
        ),
    )
    out = spans_df.select(
        F.col(id_col), F.explode(cands).alias("c")
    ).select(
        id_col,
        F.col("c.media_ref").alias("media_ref"),
        F.col("c.media_kind").alias("media_kind"),
        F.col("c.caption").alias("caption"),
        F.col("c.cap_src").alias("cap_src"),
        _tok_count(F.col("c.caption")).alias("n_cap_tokens"),
    )
    return out.filter(
        F.col("caption").isNotNull()
        & (F.col("n_cap_tokens") >= min_tokens)
        & (F.col("n_cap_tokens") <= max_tokens)
    )


# escaped literal (never a raw control byte in source); joins the per-span
# canonical tokens — 0x1F cannot appear in normalized text, so the
# serialization is prefix-collision-free
_FP_SEP = "\x1f"


def _span_token_rows(
    spans_df: DataFrame,
    media_df: DataFrame,
    id_col: str,
    spans_col: str,
    asset_col: str,
    payload_col: str,
) -> DataFrame:
    """Per-span content tokens as slim rows (_doc, _off, _tok): a text
    span tokenizes to 'T:' + md5(whitespace-normalized lowercase text)
    — digested MAP-SIDE in the explode projection so raw text never
    crosses an Exchange — a media span to 'M:' + sha256(payload bytes)
    of its asset, and a dangling ref to 'M!' + ref (never collides with
    real content). NULL text contributes the empty-text token. The
    shared core of multimodal_fingerprints (offset-ordered exact tier)
    and multimodal_token_sets (set-semantics fuzzy tier)."""
    digests = media_df.select(
        F.col(asset_col).alias("_ref"),
        F.sha2(F.col(payload_col).cast("binary"), 256).alias("_sha"),
    )
    norm = lambda t: F.regexp_replace(  # noqa: E731
        F.trim(F.lower(F.coalesce(t, F.lit("")))), r"\s+", " "
    )
    ex = spans_df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.col(spans_col)).alias("s"),
    ).select(
        "_doc",
        F.col("s.offset").alias("_off"),
        # text digested here, map-side: only the 35-char token shuffles
        F.when(
            F.col("s.kind") == F.lit("text"),
            F.concat(F.lit("T:"), F.md5(norm(F.col("s.text")))),
        ).alias("_txt_tok"),
        F.when(F.col("s.kind") != F.lit("text"), F.col("s.media_ref")).alias(
            "_ref"
        ),
    )
    return ex.join(digests, "_ref", "left").select(
        "_doc",
        "_off",
        F.coalesce(
            F.col("_txt_tok"),
            F.when(
                F.col("_sha").isNotNull(), F.concat(F.lit("M:"), F.col("_sha"))
            ).otherwise(
                # coalesce: concat('M!', NULL) is NULL, which would NULL
                # the whole fingerprint fold and collapse a content-rich
                # doc onto md5('') — the empty-doc fingerprint. A
                # NULL-ref media span tokenizes as bare 'M!' instead:
                # distinct from every real token and from emptiness.
                F.concat(F.lit("M!"), F.coalesce(F.col("_ref"), F.lit("")))
            ),
        ).alias("_tok"),
    )


def multimodal_fingerprints(
    spans_df: DataFrame,
    media_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    asset_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Content fingerprint of a whole interleaved document: md5 over the
    offset-ordered sequence of per-span tokens, where a text span
    contributes 'T:' + md5(whitespace-normalized lowercase text) and a
    media span contributes 'M:' + sha256(payload bytes) of the asset it
    references.

    Two docs are multimodal duplicates iff BOTH their text and the
    CONTENT of their media agree position-for-position — renamed or
    re-uploaded assets (different media_ref, same bytes) still match,
    while a caption-identical doc with different imagery does not.
    Text-only exact dedup (dedup.exact_dedup) cannot make either call.

    A media_ref with no row in media_df contributes 'M!' + ref — a
    dangling reference never collides with real content, so broken docs
    can only match docs broken the same way (surface them with
    media_integrity).

    Scale shape: text is digested to 32 hex chars MAP-SIDE, in the
    explode projection, before anything shuffles — raw text never
    crosses an Exchange. Exactly two slim shuffles move
    (doc_id, offset, <=67-char token) rows: the media-digest join on
    ref and the per-doc regroup; the join back to the id spine carries
    (id, fingerprint) pairs only. A doc with an empty spans array
    fingerprints as md5('') (all empty docs match each other); a NULL
    text span contributes the empty-text token rather than nulling the
    fold. PRECONDITION: id_col is unique per document row — duplicate
    ids would merge into one fingerprint over the union of their
    spans. Returns (id, fingerprint)."""
    toks = _span_token_rows(
        spans_df, media_df, id_col, spans_col, asset_col, payload_col
    )
    return _fingerprints_from_token_rows(
        toks, spans_df.select(F.col(id_col)), id_col
    )


def _fingerprints_from_token_rows(
    toks: DataFrame, ids: DataFrame, id_col: str
) -> DataFrame:
    """Fold pre-built (_doc, _off, _tok) rows into (id, fingerprint);
    `ids` is the id spine (empty-token docs coalesce to md5(''))."""
    fp = toks.groupBy("_doc").agg(
        F.md5(
            F.aggregate(
                F.array_sort(  # struct default ordering: _off first
                    F.collect_list(F.struct(F.col("_off"), F.col("_tok")))
                ),
                F.lit("").cast("string"),
                lambda acc, s: F.concat(acc, F.lit(_FP_SEP), s["_tok"]),
            )
        ).alias("fingerprint")
    )
    return ids.join(fp, ids[id_col] == fp["_doc"], "left").select(
        F.col(id_col),
        F.coalesce(F.col("fingerprint"), F.md5(F.lit(""))).alias(
            "fingerprint"
        ),
    )


def multimodal_dedup(
    spans_df: DataFrame,
    media_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    asset_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact multimodal dedup verdict per document: group docs by their
    multimodal_fingerprints fingerprint; every doc gets (id,
    canonical_id = group min, n_copies). Only (id, fingerprint) pairs
    cross the grouping shuffle.

    Plan shape: group stats come from a WINDOW over fingerprint, not a
    groupBy + self-join — the join form puts the fingerprint pipeline
    (explode, media join, regroup) in TWO plan branches, and Spark does
    not reuse common subplans across different exchanges, so the whole
    corpus-scale computation would run twice. One pass, one shuffle."""
    from pyspark.sql import Window

    fp = multimodal_fingerprints(
        spans_df, media_df, id_col, spans_col, asset_col, payload_col
    )
    w = Window.partitionBy("fingerprint")
    return fp.select(
        id_col,
        F.min(id_col).over(w).alias("canonical_id"),
        F.count("*").over(w).cast("int").alias("n_copies"),
    )


def media_integrity(
    spans_df: DataFrame,
    media_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    asset_col: str = "asset_id",
) -> DataFrame:
    """Referential-integrity audit between interleaved documents and the
    media-asset table: DANGLING references (a span points at an asset
    with no row — decode would fail mid-pipeline) and ORPHAN assets
    (stored bytes no document references — reclaimable storage).

    At 10^12 docs both directions matter operationally: dangling refs
    break extraction jobs late and expensively; orphans are silent cost.
    Two anti-joins over slim (ref/asset) keys — payload bytes are never
    read. Returns (status in {'dangling_ref','orphan_asset'}, key,
    n_docs referencing — 0 for orphans)."""
    refs = (
        spans_df.select(
            F.col(id_col).alias("_doc"),
            F.explode(
                F.filter(F.col(spans_col), lambda s: s["kind"] != F.lit("text"))
            ).alias("s"),
        )
        .select("_doc", F.col("s.media_ref").alias("_ref"))
        .groupBy("_ref")
        .agg(F.count_distinct("_doc").cast("int").alias("n_docs"))
    )
    assets = media_df.select(F.col(asset_col).alias("_ref")).distinct()
    dangling = refs.join(assets, "_ref", "left_anti").select(
        F.lit("dangling_ref").alias("status"),
        F.col("_ref").alias("key"),
        "n_docs",
    )
    orphans = assets.join(refs, "_ref", "left_anti").select(
        F.lit("orphan_asset").alias("status"),
        F.col("_ref").alias("key"),
        F.lit(0).alias("n_docs"),
    )
    return dangling.unionByName(orphans)


def interleave_token_costs(
    spans_df: DataFrame,
    media_token_cost: int = 64,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Per-document training-token cost of an interleaved document:
    whitespace tokens summed over text spans plus a FIXED per-media-span
    cost (VLM training encodes each image/video clip as a constant-size
    block of vision tokens — Flamingo/LLaVA-style — so a media span's
    context-window cost is a constant, not a function of its bytes).

    This is the cost model multimodal sequence packing needs: feed the
    output straight into packing.pack_sequences to bin interleaved docs
    into fixed context windows. Pure map-side fold (one aggregate over
    the spans array, JVM expressions only) — zero shuffle, payload bytes
    and media tables never touched. Returns (id, n_text_tokens, n_media,
    n_tokens)."""
    if media_token_cost < 0:
        raise ValueError(
            f"media_token_cost must be >= 0, got {media_token_cost}"
        )
    is_text = lambda s: s["kind"] == F.lit("text")  # noqa: E731
    text_tokens = F.aggregate(
        F.col(spans_col),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(is_text(s), _tok_count(s["text"]).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    n_media = F.size(F.filter(F.col(spans_col), lambda s: ~is_text(s)))
    return spans_df.select(
        F.col(id_col),
        text_tokens.alias("n_text_tokens"),
        n_media.cast("int").alias("n_media"),
        (text_tokens + n_media.cast("long") * media_token_cost).alias(
            "n_tokens"
        ),
    )


def dedup_assets(
    media_df: DataFrame,
    asset_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Content-address the media-asset store: every asset gets
    (asset_id, sha, canonical_id = lowest asset_id sharing its sha256,
    n_copies, reclaim_bytes = its own byte size if it is a non-canonical
    duplicate else 0).

    At 10^12 documents the asset store dominates storage; re-uploads and
    mirror crawls store the same bytes under many names. Summing
    reclaim_bytes prices the dedup win; joining the mapping into
    rewrite_media_refs repoints documents at canonical assets so the
    duplicates become deletable. Only (asset_id, sha, n_bytes) slim
    triples cross the grouping shuffle — payload bytes are hashed
    map-side and never move.

    A NULL payload means UNKNOWN content, not shared content: sha2(NULL)
    is NULL, and grouping on it would declare every null-payload asset a
    duplicate of the others (the exact_dedup null-text hazard). Null
    rows stay singletons: canonical = self, n_copies 1, reclaim 0, sha
    NULL preserved as the diagnostic.

    Plan shape: group stats from a WINDOW over sha (one pass, one
    shuffle) — a groupBy + join-back would hash every payload twice,
    since the two plan branches cannot share the scan. The window does
    put all same-sha rows in one partition; a pathological store where
    ONE blob has billions of names would skew that task, at which point
    the groupBy+join form (partial aggregation) is the right trade."""
    from pyspark.sql import Window

    d = media_df.select(
        F.col(asset_col).alias("asset_id"),
        F.sha2(F.col(payload_col).cast("binary"), 256).alias("sha"),
        F.length(F.col(payload_col).cast("binary")).cast("long").alias(
            "_bytes"
        ),
    )
    w = Window.partitionBy("sha")
    canonical = F.when(
        F.col("sha").isNotNull(), F.min("asset_id").over(w)
    ).otherwise(F.col("asset_id"))
    n_copies = F.when(
        F.col("sha").isNotNull(), F.count("*").over(w).cast("int")
    ).otherwise(F.lit(1))
    return d.select(
        "asset_id",
        "sha",
        canonical.alias("canonical_id"),
        n_copies.alias("n_copies"),
        F.when(F.col("asset_id") != canonical, F.col("_bytes"))
        .otherwise(F.lit(0).cast("long"))
        .alias("reclaim_bytes"),
    )


def rewrite_media_refs(
    spans_df: DataFrame,
    mapping: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Repoint every media span at its canonical asset: spans whose
    media_ref appears in `mapping` (asset_id -> canonical_id, the
    dedup_assets output or any two-column rename table) come back with
    media_ref = canonical_id; unmapped refs (incl. dangling) pass
    through unchanged. Text spans, kinds, texts and offsets are
    untouched — the span-sequence invariant is preserved up to the ref
    substitution.

    Shape: explode media spans to slim (doc, offset, ref) triples, join
    the CHANGED mappings only (asset_id != canonical_id — the common
    case is a tiny fraction of refs), regroup to a per-doc offset->ref
    map, then one array transform rewrites the spans. The candidate
    stages move id/offset/ref triples only; the final docs<->remap join
    is broadcast-eligible exactly because the remap holds only docs
    with a changed ref (Catalyst/AQE picks BroadcastHashJoin when it is
    small, making the whole rewrite exchange-free on the doc side).
    When the changed set is genuinely huge, one hash shuffle of the
    span arrays is unavoidable — the remap must colocate with its
    documents."""
    changed = mapping.select(
        F.col("asset_id").alias("_ref"), F.col("canonical_id").alias("_canon")
    ).filter(F.col("_ref") != F.col("_canon"))
    hits = (
        spans_df.select(
            F.col(id_col).alias("_doc"),
            F.explode(
                F.filter(F.col(spans_col), lambda s: s["kind"] != F.lit("text"))
            ).alias("s"),
        )
        .select("_doc", F.col("s.offset").alias("_off"), F.col("s.media_ref").alias("_ref"))
        .join(changed, "_ref")
        # malformed-doc tolerance: a NULL offset cannot be rewritten
        # positionally (and collect_list would drop the key but keep the
        # value, crashing map_from_arrays on mismatched lengths) — the
        # span passes through via the lookup-miss coalesce instead; a
        # duplicate offset resolves to min(canonical) rather than
        # throwing Spark's duplicate-map-key exception
        .filter(F.col("_off").isNotNull())
        .groupBy("_doc", "_off")
        .agg(F.min("_canon").alias("_canon"))
        .groupBy("_doc")
        .agg(
            F.map_from_arrays(
                F.collect_list("_off"), F.collect_list("_canon")
            ).alias("_remap")
        )
    )
    rewritten = F.transform(
        F.col(spans_col),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            F.when(
                s["kind"] == F.lit("text"), s["media_ref"]
            ).otherwise(
                F.coalesce(
                    F.try_element_at(F.col("_remap"), s["offset"]),
                    s["media_ref"],
                )
            ).alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    joined = spans_df.join(hits, spans_df[id_col] == hits["_doc"], "left")
    keep = [c for c in spans_df.columns if c != spans_col]
    return joined.select(*keep, rewritten.alias(spans_col))


def multimodal_token_sets(
    spans_df: DataFrame,
    media_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    asset_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Distinct span-content tokens per document as (id, shingle) — the
    SET view of _span_token_rows (offsets dropped, duplicates
    collapsed). This is the unit the fuzzy multimodal tier measures
    Jaccard over: a text chunk counts once however often it repeats,
    and a media asset counts by content, not by name."""
    return (
        _span_token_rows(
            spans_df, media_df, id_col, spans_col, asset_col, payload_col
        )
        .select(F.col("_doc").alias("id"), F.col("_tok").alias("shingle"))
        .distinct()
    )


def multimodal_minhash_pairs(
    spans_df: DataFrame,
    media_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    asset_col: str = "asset_id",
    payload_col: str = "payload",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 1337,
    staging_dir: str | None = None,
) -> DataFrame:
    """NEAR-duplicate interleaved documents: MinHash-LSH over the
    per-document SET of span-content tokens ('T:'+md5(text chunk) /
    'M:'+sha256(asset bytes)), banded candidates verified by exact
    Jaccard. The fuzzy tier the exact tier cannot cover: two docs equal
    except one swapped image, one edited chunk, or a few reordered
    spans score jaccard just below 1.0 and pair up here, while
    multimodal_dedup (position-exact) correctly keeps them apart.
    Conversely pure-text minhash (dedup.minhash_dedup_pairs) would call
    media-swapped docs identical — media content participates in the
    token set here.

    Scale shape inherited from the proven q21 path: tokens are digests
    (raw text never shuffles), signatures are 64 longs/doc, banding
    buckets join on (band, bucket) ints/strings, and the exact verify
    is size-ratio-prefiltered + semi-join-pruned. Returns
    (id_a, id_b, jaccard) with id_a < id_b.

    `staging_dir` (recommended for production runs): the token frame
    feeds FOUR consumers (signatures, sizes, both intersection legs)
    whose column-pruned subplans differ, so pure-lazy execution re-runs
    the explode + media-digest join per consumer. Passing a directory
    stages the slim (id, shingle) frame to parquet ONCE; left off by
    default so the operator stays side-effect-free (same contract as
    dedup.minhash_dedup_pairs)."""
    from horus_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_from_tokens,
        verify_token_pairs,
    )

    toks = multimodal_token_sets(
        spans_df, media_df, id_col, spans_col, asset_col, payload_col
    )
    if staging_dir is not None:
        import os

        path = os.path.join(staging_dir, "multimodal_tokens")
        toks.write.mode("overwrite").parquet(path)
        toks = spans_df.sparkSession.read.parquet(path)
    sigs = minhash_signatures_from_tokens(toks, k=k, seed=seed)
    cand = lsh_candidate_pairs(sigs, bands, k=k)
    return verify_token_pairs(cand, toks, threshold)


def modality_mixture(
    spans_df: DataFrame,
    media_token_cost: int = 64,
    rich_min_media: int = 4,
    alpha: float = 0.3,
    token_budget: int = 1_000_000,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Route interleaved documents into modality classes and allocate a
    training-token budget across the classes with the UniMax
    temperature rule (mixture.temperature_mixture): text_only
    (no media spans), light_multimodal (fewer than `rich_min_media`
    media spans), media_rich (the rest). Tokens are counted in the
    MULTIMODAL cost model — text tokens plus a constant vision-token
    block per media span — i.e. the unit a VLM trainer's context budget
    is actually spent in; a text-token mixture would systematically
    under-budget the media-rich class.

    Zero-join composition: routing rides the same map-side cost fold
    that computes the tokens (interleave_token_costs), so the only
    shuffle is the |classes|-row aggregation inside
    temperature_mixture. Returns one row per populated class:
    (domain, n_docs, n_tokens, p_raw, p_mix, target_tokens, epochs)."""
    if rich_min_media < 1:
        raise ValueError(
            f"rich_min_media must be >= 1, got {rich_min_media}"
        )
    from horus_spark.operators.mixture import temperature_mixture

    costs = interleave_token_costs(
        spans_df, media_token_cost, id_col, spans_col
    )
    routed = costs.select(
        F.when(F.col("n_media") == 0, F.lit("text_only"))
        .when(F.col("n_media") < rich_min_media, F.lit("light_multimodal"))
        .otherwise(F.lit("media_rich"))
        .alias("modality"),
        "n_tokens",
    )
    return temperature_mixture(
        routed,
        domain_col="modality",
        alpha=alpha,
        token_budget=token_budget,
        tokens_col="n_tokens",
    )


def build_multimodal_index(
    spans_df: DataFrame,
    media_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    asset_col: str = "asset_id",
    payload_col: str = "payload",
    k: int = 64,
    seed: int = 1337,
    staging_dir: str | None = None,
) -> DataFrame:
    """Persistable corpus index for INCREMENTAL multimodal dedup:
    (id, content_md5 = the multimodal fingerprint, sig = minhash
    signature over the span-content token set). ~0.6 KB/doc regardless
    of document or media size — a new crawl batch is deduplicated
    against 10^12 documents by probing this index, never by re-reading
    spans or payloads. Docs with an empty token set (empty spans) carry
    a NULL sig and participate only in the exact tier.

    Both outputs derive from ONE _span_token_rows frame (the explode +
    media-digest join runs once in the plan, not once per output);
    `staging_dir` additionally stages that frame to parquet so the
    fingerprint fold and the signature aggregation — different
    column-pruned consumers Spark cannot share — read it back instead
    of each re-running the join (the minhash_dedup_pairs pattern)."""
    from horus_spark.operators.dedup import minhash_signatures_from_tokens

    rows = _span_token_rows(
        spans_df, media_df, id_col, spans_col, asset_col, payload_col
    )
    if staging_dir is not None:
        import os

        path = os.path.join(staging_dir, "multimodal_token_rows")
        rows.write.mode("overwrite").parquet(path)
        rows = spans_df.sparkSession.read.parquet(path)
    fp = _fingerprints_from_token_rows(
        rows, spans_df.select(F.col(id_col)), id_col
    ).select(F.col(id_col).alias("id"), F.col("fingerprint").alias("content_md5"))
    toks = rows.select(
        F.col("_doc").alias("id"), F.col("_tok").alias("shingle")
    ).distinct()
    sigs = minhash_signatures_from_tokens(toks, k=k, seed=seed)
    return fp.join(sigs, "id", "left")


def incremental_multimodal_dedup(
    batch_spans: DataFrame,
    media_df: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    asset_col: str = "asset_id",
    payload_col: str = "payload",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 1337,
    staging_dir: str | None = None,
) -> DataFrame:
    """Deduplicate a NEW batch of interleaved documents against an
    existing corpus index (build_multimodal_index output) without
    touching the corpus — the continuous-ingestion shape: per-batch
    cost is O(batch + matched index slice). Four verdict tiers,
    first hit wins (dedup.incremental_verdicts semantics):
    exact_existing / exact_batch on the multimodal fingerprint
    (content-addressed: renamed assets with equal bytes still match),
    near_existing / near_batch on LSH + integer signature agreement
    >= ceil(threshold*k) over span-content token sets (catches
    media-swapped / text-edited twins). `staging_dir` passes through to
    build_multimodal_index (stage the batch token rows once). Returns
    (doc_id, verdict, partner_id)."""
    from horus_spark.operators.dedup import incremental_verdicts

    bidx = build_multimodal_index(
        batch_spans, media_df, id_col, spans_col, asset_col, payload_col,
        k=k, seed=seed, staging_dir=staging_dir,
    )
    return incremental_verdicts(bidx, index, k=k, bands=bands, threshold=threshold)


def extend_multimodal_index(
    index: DataFrame,
    batch_spans: DataFrame,
    media_df: DataFrame,
    verdicts: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    asset_col: str = "asset_id",
    payload_col: str = "payload",
    k: int = 64,
    seed: int = 1337,
) -> DataFrame:
    """index ∪ fingerprints of the batch docs judged `unique` — keeps
    the rolling multimodal index canonical across batches (duplicates
    never enter it). Persist before the next
    incremental_multimodal_dedup call."""
    uniq = verdicts.filter(F.col("verdict") == "unique").select(
        F.col("doc_id").alias("id")
    )
    fresh = build_multimodal_index(
        batch_spans, media_df, id_col, spans_col, asset_col, payload_col,
        k=k, seed=seed,
    ).join(uniq, "id")
    return index.select("id", "content_md5", "sig").unionByName(fresh)


def redact_spans(
    spans_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Structure-preserving PII redaction over interleaved documents:
    every TEXT span's text is rewritten with typed placeholders (the
    pii.PII_PATTERNS chain, same order semantics as pii.redact_pii so
    an email's digits are never double-redacted as a phone), media
    spans and all offsets pass through untouched — the span-sequence
    contract survives the compliance pass, so downstream caption mining
    / packing / fingerprinting run unchanged on the redacted corpus.

    Also emits n_pii = total matches summed over the document's text
    spans (the routing signal: quarantine docs above a threshold).
    Detection note: matching is PER SPAN — PII straddling a span
    boundary is not a match on either side of this operator's oracle,
    and in a real corpus spans are authored units (a paragraph, an alt
    text), not arbitrary splits.

    Pure map-side array transform + fold: zero shuffle, zero Python;
    inherits the scan's partitioning."""
    from horus_spark.operators.pii import PII_PATTERNS

    def red(t: Column) -> Column:
        for _, pat, token in PII_PATTERNS:
            t = F.regexp_replace(t, pat, token)
        return t

    is_text = lambda s: s["kind"] == F.lit("text")  # noqa: E731
    redacted = F.transform(
        F.col(spans_col),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(is_text(s), red(s["text"]))
            .otherwise(s["text"])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    span_count = lambda s: sum(  # noqa: E731
        (
            F.regexp_count(F.coalesce(s["text"], F.lit("")), F.lit(pat)).cast(
                "long"
            )
            for _, pat, _ in PII_PATTERNS
        ),
        F.lit(0).cast("long"),
    )
    n_pii = F.aggregate(
        F.col(spans_col),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(is_text(s), span_count(s)).otherwise(F.lit(0).cast("long")),
    )
    return spans_df.withColumn("n_pii", n_pii).withColumn(spans_col, redacted)


def segment_spans(
    spans_df: DataFrame,
    budget: int = 2048,
    media_token_cost: int = 64,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Segment each interleaved document into fixed-budget training
    WINDOWS without ever splitting a span: spans are taken in offset
    order and assigned greedy next-fit window ids (a window closes when
    the next span would push its token total past `budget`; a single
    oversize span still gets a window of its own — clip upstream if
    that matters). Costs use the multimodal model: whitespace tokens
    for text spans, a constant vision-token block per media span.

    This is the WITHIN-document step packing (q92/pack_sequences, which
    bins whole documents) does not cover — the VLM sample constructor:
    each (doc, window) is one training sample whose spans are
    contiguous in the original document, so text-media adjacency
    (captions next to their image) survives segmentation.

    Pure map-side fold per document (sort + one aggregate building the
    assignment array, then an explode) — zero shuffle. Returns one row
    per span: (id, win_id, offset, kind, span_tokens)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if media_token_cost < 0:
        raise ValueError(
            f"media_token_cost must be >= 0, got {media_token_cost}"
        )
    arr = _by_offset(F.col(spans_col))
    is_text = lambda s: s["kind"] == F.lit("text")  # noqa: E731
    cost = lambda s: F.when(  # noqa: E731
        is_text(s), _tok_count(s["text"]).cast("long")
    ).otherwise(F.lit(media_token_cost).cast("long"))
    out_t = (
        "array<struct<offset:int,kind:string,win_id:int,span_tokens:bigint>>"
    )
    assigned = F.aggregate(
        arr,
        F.struct(
            F.lit(0).alias("win"),
            F.lit(0).cast("long").alias("run"),
            F.array().cast(out_t).alias("outs"),
        ),
        lambda acc, s: F.struct(
            F.when(
                (acc["run"] > 0) & (acc["run"] + cost(s) > budget),
                acc["win"] + 1,
            )
            .otherwise(acc["win"])
            .alias("win"),
            F.when(
                (acc["run"] > 0) & (acc["run"] + cost(s) > budget), cost(s)
            )
            .otherwise(acc["run"] + cost(s))
            .alias("run"),
            F.concat(
                acc["outs"],
                F.array(
                    F.struct(
                        s["offset"].alias("offset"),
                        s["kind"].alias("kind"),
                        F.when(
                            (acc["run"] > 0)
                            & (acc["run"] + cost(s) > budget),
                            acc["win"] + 1,
                        )
                        .otherwise(acc["win"])
                        .alias("win_id"),
                        cost(s).alias("span_tokens"),
                    )
                ),
            ).alias("outs"),
        ),
        lambda acc: acc["outs"],
    )
    return spans_df.select(
        F.col(id_col), F.explode(assigned).alias("s")
    ).select(
        id_col,
        F.col("s.win_id").alias("win_id"),
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.span_tokens").alias("span_tokens"),
    )


def span_languages(
    spans_df: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Span-level language ID -> per-document language routing over an
    interleaved corpus (the CCNet shape: classify each text RUN, weight by
    its token mass, route the document by the dominant language — a
    doc-level classifier over concatenated text mislabels multilingual
    documents, and mixed-language docs need their own mixture bucket).

    Per text span: `textstats.langid_expr` (marker-word argmax, ties to
    the lexicographically-first code, 'und' when no markers hit). Per
    document: token mass per identified language (whitespace tokens of
    the spans that voted for it), then

    - dominant_lang: language with the largest mass (ties -> first code
      alphabetically; no identified mass at all -> 'und'),
    - n_langs: how many languages hold positive mass,
    - is_multilingual: 1 when n_langs >= 2 (the routing flag),
    - dom_tokens / ided_tokens / text_tokens: mass of the winner, of all
      identified spans, and of every text span ('und' included) — the
      coverage denominators a mixture planner needs.

    Media spans carry no language and no mass. Pure map-side array
    transforms + four folds per document — nested higher-order
    expressions, no UDF, ZERO shuffle; at 10^12 docs this is scan-bound.
    """
    from .textstats import LANG_MARKERS, langid_expr

    codes = sorted(LANG_MARKERS)
    arr = F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("text"))
    tagged = F.transform(
        arr,
        lambda s: F.struct(
            langid_expr(F.coalesce(s["text"], F.lit(""))).alias("lang"),
            _tok_count(s["text"]).cast("long").alias("n_tok"),
        ),
    )
    zero = F.struct(
        *(F.lit(0).cast("long").alias(c) for c in codes),
        F.lit(0).cast("long").alias("total"),
    )
    folded = F.aggregate(
        tagged,
        zero,
        lambda acc, t: F.struct(
            *(
                (
                    acc[c]
                    + F.when(t["lang"] == c, t["n_tok"]).otherwise(
                        F.lit(0).cast("long")
                    )
                ).alias(c)
                for c in codes
            ),
            (acc["total"] + t["n_tok"]).alias("total"),
        ),
    )
    # two-step select so the fold runs ONCE per document, not once per
    # derived column
    base = spans_df.select(F.col(id_col), folded.alias("m"))
    masses = {c: F.col("m")[c] for c in codes}
    dominant = F.lit("und")
    best = F.lit(0).cast("long")
    # alphabetical order + strictly-greater: the first code wins ties,
    # matching langid_expr's own tie rule
    for c in codes:
        cond = masses[c] > best
        dominant = F.when(cond, F.lit(c)).otherwise(dominant)
        best = F.when(cond, masses[c]).otherwise(best)
    n_langs = sum((masses[c] > 0).cast("int") for c in codes)
    ided = sum(masses[c] for c in codes)
    return base.select(
        F.col(id_col),
        dominant.alias("dominant_lang"),
        n_langs.cast("int").alias("n_langs"),
        (n_langs >= 2).cast("int").alias("is_multilingual"),
        best.alias("dom_tokens"),
        ided.cast("long").alias("ided_tokens"),
        F.col("m")["total"].alias("text_tokens"),
    )


def span_diff(
    actual: DataFrame,
    expected: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Span-sequence regression audit — the north-rule invariant
    (span-sequence equality of (kind, text, media_ref, order)) as a
    first-class distributed operator: compare an extraction run against
    golden fixtures (or the previous run) and report, per document, the
    verdict and the exact first divergence. This is what the pytest
    golden tests do doc-by-doc, lifted to corpus scale.

    Verdicts:
      equal            — same span count, every (kind, text, media_ref)
                         triple matches in offset order (offset VALUES
                         are not compared — the invariant is the order);
      diverged         — a triple mismatch inside the common prefix:
                         first_divergence = its 0-based position, field
                         = the first differing field (kind > text >
                         media_ref precedence);
      length_mismatch  — common prefix matches but counts differ:
                         first_divergence = the shorter length;
      missing_actual / missing_expected — the doc exists on one side
                         only (counts/positions NULL for the absent
                         side).

    Shape at scale: regression runs are overwhelmingly 'equal', so the
    comparison is digest-screened — each side serializes its ordered
    triples map-side into one md5 (fixed-width per-field digests, no
    separator-escaping hazard) and the full-outer join ships only
    (id, digest, n). Only documents whose digests differ re-fetch their
    span payloads (two semi-join-pruned id joins over the tiny divergent
    set) for the element-wise first-mismatch scan. Returns
    (id_col, verdict, n_actual, n_expected, first_divergence, field).
    """
    def slim(df: DataFrame) -> DataFrame:
        sp = _by_offset(F.col(spans_col))
        ser = F.md5(
            F.concat_ws(
                "",
                F.transform(
                    sp,
                    lambda s: F.concat(
                        F.md5(F.coalesce(s["kind"], F.lit(""))),
                        F.md5(F.coalesce(s["text"], F.lit(""))),
                        F.md5(F.coalesce(s["media_ref"], F.lit(""))),
                    ),
                ),
            )
        )
        return df.select(
            F.col(id_col).alias("id"),
            ser.alias("dg"),
            F.coalesce(F.size(F.col(spans_col)), F.lit(0))
            .cast("long")
            .alias("n"),
        )

    a, e = slim(actual), slim(expected)
    j = a.select("id", F.col("dg").alias("dg_a"), F.col("n").alias("n_a")).join(
        e.select("id", F.col("dg").alias("dg_e"), F.col("n").alias("n_e")),
        "id",
        "full_outer",
    )
    missing = j.filter(
        F.col("dg_a").isNull() | F.col("dg_e").isNull()
    ).select(
        "id",
        F.when(F.col("dg_a").isNull(), F.lit("missing_actual"))
        .otherwise(F.lit("missing_expected"))
        .alias("verdict"),
        F.col("n_a").alias("n_actual"),
        F.col("n_e").alias("n_expected"),
        F.lit(None).cast("long").alias("first_divergence"),
        F.lit(None).cast("string").alias("field"),
    )
    same = j.filter(
        F.col("dg_a").isNotNull() & (F.col("dg_a") == F.col("dg_e"))
    ).select(
        "id",
        F.lit("equal").alias("verdict"),
        F.col("n_a").alias("n_actual"),
        F.col("n_e").alias("n_expected"),
        F.lit(-1).cast("long").alias("first_divergence"),
        F.lit(None).cast("string").alias("field"),
    )
    div_ids = j.filter(
        F.col("dg_a").isNotNull()
        & F.col("dg_e").isNotNull()
        & (F.col("dg_a") != F.col("dg_e"))
    ).select("id")
    pay_a = actual.join(
        div_ids, actual[id_col] == div_ids["id"], "left_semi"
    ).select(F.col(id_col).alias("id"), _by_offset(F.col(spans_col)).alias("sa"))
    pay_e = expected.join(
        div_ids, expected[id_col] == div_ids["id"], "left_semi"
    ).select(F.col(id_col).alias("id"), _by_offset(F.col(spans_col)).alias("se"))
    both = pay_a.join(pay_e, "id")
    m = F.least(F.size("sa"), F.size("se"))
    trip_eq = lambda l, r: (  # noqa: E731 - local comparator
        l["kind"].eqNullSafe(r["kind"])
        & l["text"].eqNullSafe(r["text"])
        & l["media_ref"].eqNullSafe(r["media_ref"])
    )
    flags = F.zip_with(
        F.slice(F.col("sa"), F.lit(1), m),
        F.slice(F.col("se"), F.lit(1), m),
        lambda l, r: ~trip_eq(l, r),
    )
    first1 = F.array_position(flags, F.lit(True))  # 1-based, 0 if none
    el = F.element_at(F.col("sa"), first1.cast("int"))
    er = F.element_at(F.col("se"), first1.cast("int"))
    detailed = both.select(
        "id",
        F.when(first1 > 0, F.lit("diverged"))
        .otherwise(F.lit("length_mismatch"))
        .alias("verdict"),
        F.size("sa").cast("long").alias("n_actual"),
        F.size("se").cast("long").alias("n_expected"),
        F.when(first1 > 0, first1 - 1)
        .otherwise(m)
        .cast("long")
        .alias("first_divergence"),
        F.when(
            first1 > 0,
            F.when(
                ~el["kind"].eqNullSafe(er["kind"]), F.lit("kind")
            )
            .when(~el["text"].eqNullSafe(er["text"]), F.lit("text"))
            .otherwise(F.lit("media_ref")),
        )
        .cast("string")
        .alias("field"),
    )
    return (
        same.unionByName(missing)
        .unionByName(detailed)
        .withColumnRenamed("id", id_col)
    )
