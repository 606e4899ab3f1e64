"""Interleaved-span operators: structure stats + caption-pair mining.

Hand-computed fixtures pin the adjacency rule (preceding text preferred,
else following, else no pair), the selection-before-bounds semantic, the
offset-sort independence, and the empty/degenerate shapes; a plan check
asserts both operators stay shuffle-free.
"""

import pytest
from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def T(text, off):
    return ("text", text, "", off)


def M(kind, ref, off):
    return (kind, "", ref, off)


@pytest.fixture(scope="module")
def corpus(spark):
    return _mk(
        spark,
        [
            # T M M T : transitions T->M, M->T; runs of text = 1,1
            ("a", [T("hello world foo", 0), M("image", "a1", 1),
                   M("video", "a2", 2), T("tail caption here", 3)]),
            # lone media: no caption possible
            ("b", [M("image", "b1", 0)]),
            # media-first: caption comes from the following span
            ("c", [M("image", "c1", 0), T("after text", 1)]),
            # short preceding caption: selected then bounds-dropped
            # (must NOT fall through to the long following span)
            ("d", [T("tiny", 0), M("image", "d1", 1),
                   T("long enough caption span", 2)]),
            # empty spans array
            ("e", []),
            # all text, no media
            ("f", [T("just words", 0), T("more words", 1)]),
        ],
    )


def test_interleave_stats_values(corpus):
    from horus_spark.operators.interleave import interleave_stats

    got = {
        r["doc_id"]: r.asDict()
        for r in interleave_stats(corpus).collect()
    }
    assert got["a"] == {
        "doc_id": "a", "n_spans": 4, "n_text": 2, "n_media": 2,
        "n_transitions": 2, "max_text_run": 1,
        "text_chars": len("hello world foo") + len("tail caption here"),
    }
    assert got["b"]["n_transitions"] == 0
    assert got["b"]["max_text_run"] == 0
    assert got["e"] == {
        "doc_id": "e", "n_spans": 0, "n_text": 0, "n_media": 0,
        "n_transitions": 0, "max_text_run": 0, "text_chars": 0,
    }
    assert got["f"]["n_transitions"] == 0
    assert got["f"]["max_text_run"] == 2
    assert got["d"]["n_transitions"] == 2


def test_interleave_stats_offset_order_not_input_order(spark):
    """Stats follow offset order, not the array's physical order."""
    from horus_spark.operators.interleave import interleave_stats

    shuffled = _mk(
        spark,
        [("x", [T("b", 2), M("image", "x1", 1), T("a", 0), T("c", 3)])],
    )
    row = interleave_stats(shuffled).collect()[0]
    # offset order: T M T T -> 2 transitions, max text run 2
    assert row["n_transitions"] == 2
    assert row["max_text_run"] == 2


def test_caption_pairs_adjacency_rule(corpus):
    from horus_spark.operators.interleave import caption_pairs

    got = {
        r["media_ref"]: r.asDict()
        for r in caption_pairs(corpus, min_tokens=1, max_tokens=64).collect()
    }
    # a1: preceding text; a2: preceding is media -> following text
    assert got["a1"]["caption"] == "hello world foo"
    assert got["a1"]["cap_src"] == "before"
    assert got["a1"]["n_cap_tokens"] == 3
    assert got["a2"]["caption"] == "tail caption here"
    assert got["a2"]["cap_src"] == "after"
    # b1: no text neighbour at all -> no pair
    assert "b1" not in got
    # c1: media-first doc -> following
    assert got["c1"]["cap_src"] == "after"
    # d1: preceding 'tiny' selected (1 token, passes min_tokens=1)
    assert got["d1"]["caption"] == "tiny"


def test_caption_selection_before_bounds(corpus):
    """A too-short preceding caption drops the pair; it does NOT fall
    through to the following text span."""
    from horus_spark.operators.interleave import caption_pairs

    got = {
        r["media_ref"]
        for r in caption_pairs(corpus, min_tokens=2, max_tokens=64).collect()
    }
    assert "d1" not in got  # 'tiny' selected, then bounds-dropped
    assert "a1" in got and "a2" in got and "c1" in got


def test_caption_pairs_param_guards(corpus):
    from horus_spark.operators.interleave import caption_pairs

    with pytest.raises(ValueError):
        caption_pairs(corpus, min_tokens=0)
    with pytest.raises(ValueError):
        caption_pairs(corpus, min_tokens=5, max_tokens=4)


def test_interleave_plans_shuffle_free(corpus):
    from horus_spark.operators.interleave import caption_pairs, interleave_stats

    for df in (interleave_stats(corpus), caption_pairs(corpus)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_span_languages_routing(spark):
    """Hand-computed language routing: dominance by token MASS (not span
    count), the alphabetical tie rule at both levels, unidentified mass
    counted in text_tokens but never in ided/dom, and media/empty spans
    carrying nothing."""
    from horus_spark.operators.interleave import span_languages

    df = _mk(
        spark,
        [
            # en 10 tokens vs de 8 tokens -> en dominant, multilingual
            ("d1", [T("the cat and the dog of a house is here", 0),
                    M("image", "a-1", 1),
                    T("der hund und die katze ist das", 2)]),
            # blank text + media only -> all zeros, 'und'
            ("d2", [T("", 0), M("video", "a-2", 1)]),
            # empty spans array -> still one verdict row
            ("d3", []),
            # tokens but no marker hits: und-dominant doc, mass only in
            # text_tokens
            ("d4", [T("zzz qqq xxx", 0)]),
            # 3-token es span vs 3-token fr span -> tie -> es (alphabetical)
            ("d5", [T("el y los", 0), T("le et les", 1)]),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in span_languages(df).collect()}
    assert got["d1"] == {
        "doc_id": "d1", "dominant_lang": "en", "n_langs": 2,
        "is_multilingual": 1, "dom_tokens": 10, "ided_tokens": 17,
        "text_tokens": 17,
    }
    assert got["d2"] == {
        "doc_id": "d2", "dominant_lang": "und", "n_langs": 0,
        "is_multilingual": 0, "dom_tokens": 0, "ided_tokens": 0,
        "text_tokens": 0,
    }
    assert got["d3"]["dominant_lang"] == "und"
    assert got["d4"] == {
        "doc_id": "d4", "dominant_lang": "und", "n_langs": 0,
        "is_multilingual": 0, "dom_tokens": 0, "ided_tokens": 0,
        "text_tokens": 3,
    }
    assert got["d5"]["dominant_lang"] == "es"
    assert got["d5"]["is_multilingual"] == 1


def test_span_languages_shuffle_free(corpus):
    from horus_spark.operators.interleave import span_languages

    df = span_languages(corpus)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert df.count() == corpus.count()  # every doc gets a verdict


# ---- multimodal fingerprints / dedup / integrity ----------------------


@pytest.fixture(scope="module")
def mm_corpus(spark):
    docs = _mk(
        spark,
        [
            # p and q: same text, DIFFERENT refs holding identical bytes
            ("p", [T("same text", 0), M("image", "m1", 1)]),
            ("q", [T("same text", 0), M("image", "m2", 1)]),
            # r: same text, different media CONTENT
            ("r", [T("same text", 0), M("image", "m3", 1)]),
            # s: different text, same media as p
            ("s", [T("other text", 0), M("image", "m1", 1)]),
            # t, u: same text + same DANGLING ref; v: different dangling
            ("t", [T("same text", 0), M("image", "ghost", 1)]),
            ("u", [T("same text", 0), M("image", "ghost", 1)]),
            ("v", [T("same text", 0), M("image", "ghost2", 1)]),
        ],
    )
    media = spark.createDataFrame(
        [("m1", "bytes-A"), ("m2", "bytes-A"), ("m3", "bytes-B"),
         ("unused", "bytes-C")],
        "asset_id string, payload string",
    )
    return docs, media


def _fps(docs, media):
    from horus_spark.operators.interleave import multimodal_fingerprints

    return {
        r["doc_id"]: r["fingerprint"]
        for r in multimodal_fingerprints(docs, media).collect()
    }


def test_multimodal_fingerprint_semantics(mm_corpus):
    """Content-addressed: renamed assets with equal bytes match; either
    modality differing breaks the match; dangling refs only match the
    SAME dangling ref (never real content)."""
    fp = _fps(*mm_corpus)
    assert fp["p"] == fp["q"]          # rename-invariant (bytes equal)
    assert fp["p"] != fp["r"]          # media content differs
    assert fp["p"] != fp["s"]          # text differs
    assert fp["t"] == fp["u"]          # same dangling ref matches itself
    assert fp["t"] != fp["v"]          # different dangling ref
    assert fp["t"] != fp["p"]          # dangling never collides w/ content


def test_multimodal_fingerprint_text_normalization(mm_corpus, spark):
    """Whitespace runs and case do not affect the text contribution."""
    _, media = mm_corpus
    docs = _mk(
        spark,
        [
            ("n1", [T("Same   TEXT", 0), M("image", "m1", 1)]),
            ("n2", [T("same text", 0), M("image", "m1", 1)]),
        ],
    )
    fp = _fps(docs, media)
    assert fp["n1"] == fp["n2"]


def test_multimodal_fingerprint_offset_order_not_input_order(mm_corpus, spark):
    """The fold follows offset order even when the array is shuffled."""
    _, media = mm_corpus
    docs = _mk(
        spark,
        [
            ("o1", [M("image", "m1", 1), T("same text", 0)]),
            ("o2", [T("same text", 0), M("image", "m1", 1)]),
            # same spans at swapped offsets -> DIFFERENT document
            ("o3", [T("same text", 1), M("image", "m1", 0)]),
        ],
    )
    fp = _fps(docs, media)
    assert fp["o1"] == fp["o2"]
    assert fp["o3"] != fp["o2"]


def test_multimodal_dedup_groups(mm_corpus):
    from horus_spark.operators.interleave import multimodal_dedup

    docs, media = mm_corpus
    got = {
        r["doc_id"]: (r["canonical_id"], r["n_copies"])
        for r in multimodal_dedup(docs, media).collect()
    }
    assert len(got) == 7               # every doc gets a verdict
    assert got["p"] == ("p", 2) and got["q"] == ("p", 2)
    assert got["t"] == ("t", 2) and got["u"] == ("t", 2)
    for single in ("r", "s", "v"):
        assert got[single] == (single, 1)


def test_media_integrity_audit(mm_corpus):
    from horus_spark.operators.interleave import media_integrity

    docs, media = mm_corpus
    rows = {
        (r["status"], r["key"]): r["n_docs"]
        for r in media_integrity(docs, media).collect()
    }
    assert rows == {
        ("dangling_ref", "ghost"): 2,   # referenced by t and u
        ("dangling_ref", "ghost2"): 1,
        ("orphan_asset", "unused"): 0,
    }


def test_media_integrity_never_reads_payload(mm_corpus, spark, tmp_path):
    """The audit joins on asset ids only — a parquet-backed asset store
    must show a payload-free ReadSchema (at 100 TB the payload column IS
    the table; scanning it would turn a metadata audit into a full
    corpus read)."""
    from horus_spark.operators.interleave import media_integrity

    docs, media = mm_corpus
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    audit = media_integrity(docs, spark.read.parquet(path))
    audit.collect()
    plan = audit._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


# ---- token costs / asset compaction ------------------------------------


def test_interleave_token_costs_values(mm_corpus, spark):
    from horus_spark.operators.interleave import interleave_token_costs

    docs = _mk(
        spark,
        [
            ("a", [T("one two three", 0), M("image", "x", 1),
                   T("four five", 2), M("video", "y", 3)]),
            ("b", [T("   ", 0)]),          # blank text span -> 0 tokens
            ("c", []),                      # empty doc
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in interleave_token_costs(docs, media_token_cost=64).collect()
    }
    assert got["a"] == {
        "doc_id": "a", "n_text_tokens": 5, "n_media": 2,
        "n_tokens": 5 + 2 * 64,
    }
    assert got["b"]["n_tokens"] == 0
    assert got["c"] == {
        "doc_id": "c", "n_text_tokens": 0, "n_media": 0, "n_tokens": 0,
    }


def test_interleave_token_costs_guard_and_plan(mm_corpus):
    from horus_spark.operators.interleave import interleave_token_costs

    docs, _ = mm_corpus
    with pytest.raises(ValueError):
        interleave_token_costs(docs, media_token_cost=-1)
    plan = (
        interleave_token_costs(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_token_costs_feed_packing(mm_corpus):
    """Composition: the cost frame packs into budget-respecting
    sequences (each sequence's token total <= budget unless it is a
    single oversize doc)."""
    from horus_spark.operators.interleave import interleave_token_costs
    from horus_spark.operators.packing import pack_sequences

    docs, _ = mm_corpus
    packed = pack_sequences(
        interleave_token_costs(docs, media_token_cost=10),
        "doc_id", "n_tokens", budget=20, n_shards=2,
    ).collect()
    assert {r["doc_id"] for r in packed} == {
        r["doc_id"] for r in docs.collect()
    }
    by_seq = {}
    for r in packed:
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    for members in by_seq.values():
        total = sum(m["n_tokens"] for m in members)
        assert total <= 20 or len(members) == 1


def test_dedup_assets_mapping(spark):
    from horus_spark.operators.interleave import dedup_assets

    media = spark.createDataFrame(
        [("a3", "bytes-A"), ("a1", "bytes-A"), ("a2", "bytes-A"),
         ("b1", "bytes-Blonger"), ("c1", "unique")],
        "asset_id string, payload string",
    )
    got = {r["asset_id"]: r.asDict() for r in dedup_assets(media).collect()}
    assert got["a1"]["canonical_id"] == "a1"
    assert got["a1"]["n_copies"] == 3
    assert got["a1"]["reclaim_bytes"] == 0          # canonical keeps bytes
    assert got["a2"]["canonical_id"] == "a1"
    assert got["a2"]["reclaim_bytes"] == len("bytes-A")
    assert got["a3"]["reclaim_bytes"] == len("bytes-A")
    assert got["b1"]["n_copies"] == 1 and got["b1"]["reclaim_bytes"] == 0
    assert got["c1"]["canonical_id"] == "c1"


def test_rewrite_media_refs(mm_corpus, spark):
    from horus_spark.operators.interleave import rewrite_media_refs

    docs, _ = mm_corpus
    mapping = spark.createDataFrame(
        [("m2", "m1"), ("m1", "m1"), ("m3", "m3")],
        "asset_id string, canonical_id string",
    )
    before = {r["doc_id"]: r["spans"] for r in docs.collect()}
    after = {
        r["doc_id"]: r["spans"]
        for r in rewrite_media_refs(docs, mapping).collect()
    }
    assert set(after) == set(before)
    # q's m2 -> m1; everything else about the span survives
    q_media = [s for s in after["q"] if s["kind"] != "text"][0]
    assert q_media["media_ref"] == "m1"
    assert q_media["offset"] == 1 and q_media["kind"] == "image"
    # identity-mapped, unmapped, and dangling refs pass through;
    # text spans and media-free docs are byte-identical
    assert after["p"] == before["p"]      # m1 -> m1 identity
    assert after["r"] == before["r"]      # m3 -> m3 identity
    assert after["t"] == before["t"]      # dangling 'ghost' not in mapping
    assert [s for s in after["q"] if s["kind"] == "text"] == [
        s for s in before["q"] if s["kind"] == "text"
    ]


def test_multimodal_fingerprint_empty_docs_match(mm_corpus, spark):
    """Empty spans arrays fingerprint identically (md5('')) and never
    collide with non-empty docs."""
    _, media = mm_corpus
    docs = _mk(spark, [("e1", []), ("e2", []), ("x", [T("hi", 0)])])
    fp = _fps(docs, media)
    assert fp["e1"] == fp["e2"]
    assert fp["e1"] != fp["x"]


def test_null_text_span_does_not_poison_folds(mm_corpus, spark):
    """A NULL text inside a text span must act as empty text, not null
    the whole document's aggregates (acc + NULL is NULL in a fold)."""
    from horus_spark.operators.interleave import (
        interleave_stats,
        interleave_token_costs,
        multimodal_fingerprints,
    )

    _, media = mm_corpus
    docs = _mk(
        spark,
        [
            ("n", [("text", None, "", 0), T("two words", 1)]),
            ("e", [T("", 0), T("two words", 1)]),  # empty-text twin
        ],
    )
    stats = {r["doc_id"]: r.asDict() for r in interleave_stats(docs).collect()}
    assert stats["n"]["text_chars"] == len("two words")
    assert stats["n"]["max_text_run"] == 2
    costs = {
        r["doc_id"]: r["n_tokens"]
        for r in interleave_token_costs(docs).collect()
    }
    assert costs["n"] == 2
    fp = {
        r["doc_id"]: r["fingerprint"]
        for r in multimodal_fingerprints(docs, media).collect()
    }
    assert fp["n"] is not None
    assert fp["n"] == fp["e"]  # NULL text == empty text, position-wise


def test_dedup_assets_null_payloads_stay_singletons(spark):
    """NULL payload = unknown content: two null-payload assets must NOT
    be declared duplicates of each other."""
    from horus_spark.operators.interleave import dedup_assets

    media = spark.createDataFrame(
        [("a1", None), ("a2", None), ("b1", "bytes"), ("b2", "bytes")],
        "asset_id string, payload string",
    )
    got = {r["asset_id"]: r.asDict() for r in dedup_assets(media).collect()}
    assert got["a1"]["canonical_id"] == "a1" and got["a1"]["n_copies"] == 1
    assert got["a2"]["canonical_id"] == "a2" and got["a2"]["n_copies"] == 1
    assert got["a1"]["reclaim_bytes"] == 0 and got["a1"]["sha"] is None
    assert got["b2"]["canonical_id"] == "b1" and got["b2"]["n_copies"] == 2


# ---- fuzzy multimodal near-dup tier ------------------------------------


@pytest.fixture(scope="module")
def neardup_corpus(spark):
    """A (14 text + 6 media = 20 tokens), B = A with ONE media payload
    swapped (19/21 jaccard), C = A with one asset RENAMED to equal bytes
    (identical token set), D unrelated."""
    texts = [f"unique chunk number {i} words" for i in range(14)]

    def doc(did, media_refs):
        spans, off = [], 0
        for i, t in enumerate(texts):
            spans.append(T(t, off)); off += 1
            if i < len(media_refs):
                spans.append(M("image", media_refs[i], off)); off += 1
        return (did, spans)

    docs = _mk(
        spark,
        [
            doc("A", ["m0", "m1", "m2", "m3", "m4", "m5"]),
            doc("B", ["m0", "m1", "m2", "m3", "m4", "m5b"]),
            doc("C", ["m0x", "m1", "m2", "m3", "m4", "m5"]),
            ("D", [T("totally different text", 0), M("image", "m9", 1)]),
        ],
    )
    media = spark.createDataFrame(
        [("m0", "p0"), ("m1", "p1"), ("m2", "p2"), ("m3", "p3"),
         ("m4", "p4"), ("m5", "p5"), ("m5b", "DIFFERENT"),
         ("m0x", "p0"), ("m9", "p9")],
        "asset_id string, payload string",
    )
    return docs, media


def test_multimodal_token_sets_semantics(neardup_corpus, spark):
    from horus_spark.operators.interleave import multimodal_token_sets

    docs, media = neardup_corpus
    sizes = {
        r["id"]: r["n"]
        for r in multimodal_token_sets(docs, media)
        .groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    assert sizes["A"] == 20 and sizes["B"] == 20 and sizes["D"] == 2
    # repeated identical chunks collapse (set semantics)
    rep = _mk(spark, [("r", [T("same", 0), T("same", 1), T("same", 2)])])
    n = multimodal_token_sets(rep, media).count()
    assert n == 1


def test_multimodal_minhash_pairs_neardup(neardup_corpus):
    """The fuzzy tier pairs the one-image-swapped twin at 19/21 jaccard
    and the renamed-asset twin at 1.0; the exact tier agrees only on
    the rename (position-exact content equality)."""
    from horus_spark.operators.interleave import (
        multimodal_dedup,
        multimodal_minhash_pairs,
    )

    docs, media = neardup_corpus
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in multimodal_minhash_pairs(docs, media, threshold=0.5).collect()
    }
    assert pairs[("A", "B")] == round(19 / 21, 6)
    assert pairs[("A", "C")] == 1.0
    assert pairs[("B", "C")] == round(19 / 21, 6)
    assert not any("D" in p for p in pairs)
    # exact tier: only the renamed twin groups with A
    groups = {
        r["doc_id"]: r["canonical_id"]
        for r in multimodal_dedup(docs, media).collect()
    }
    assert groups["C"] == "A" and groups["A"] == "A"
    assert groups["B"] == "B" and groups["D"] == "D"


def test_multimodal_minhash_threshold(neardup_corpus):
    from horus_spark.operators.interleave import multimodal_minhash_pairs

    docs, media = neardup_corpus
    strict = {
        (r["id_a"], r["id_b"])
        for r in multimodal_minhash_pairs(docs, media, threshold=0.95).collect()
    }
    assert strict == {("A", "C")}


def test_modality_mixture_routing_and_math(spark):
    """Three classes routed by media count; UniMax shares over the
    MULTIMODAL token masses (hand math, alpha=0.5 for sqrt)."""
    import math

    from horus_spark.operators.interleave import modality_mixture

    docs = _mk(
        spark,
        [
            ("t1", [T("a b c", 0)]),                       # text_only, 3
            ("t2", [T("d e", 0)]),                         # text_only, 2
            ("l1", [T("x y z w", 0), M("image", "m", 1)]),  # light, 4+64
            ("r1", [T("q", 0), M("image", "a", 1), M("video", "b", 2),
                    M("image", "c", 3), M("video", "d", 4)]),  # rich, 1+256
        ],
    )
    got = {
        r["domain"]: r.asDict()
        for r in modality_mixture(
            docs, media_token_cost=64, rich_min_media=4,
            alpha=0.5, token_budget=1000,
        ).collect()
    }
    masses = {"text_only": 5, "light_multimodal": 68, "media_rich": 257}
    total = sum(masses.values())
    mw = {d: round(math.sqrt(n / total) * 1e9) for d, n in masses.items()}
    msum = sum(mw.values())
    assert {d: got[d]["n_tokens"] for d in got} == masses
    assert got["text_only"]["n_docs"] == 2
    for d in masses:
        assert got[d]["p_mix"] == pytest.approx(round(mw[d] / msum, 6))
        assert got[d]["target_tokens"] == round(1000 * mw[d] / msum)
    # temperature flattening: the small class gains share
    assert got["text_only"]["p_mix"] > got["text_only"]["p_raw"]


def test_modality_mixture_guard(mm_corpus):
    from horus_spark.operators.interleave import modality_mixture

    docs, _ = mm_corpus
    with pytest.raises(ValueError):
        modality_mixture(docs, rich_min_media=0)


def test_multimodal_minhash_staging_parity(neardup_corpus, tmp_path):
    """staging_dir changes the plan (token frame staged once), never
    the answer."""
    from horus_spark.operators.interleave import multimodal_minhash_pairs

    docs, media = neardup_corpus
    plain = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in multimodal_minhash_pairs(docs, media, threshold=0.5).collect()
    }
    staged = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in multimodal_minhash_pairs(
            docs, media, threshold=0.5, staging_dir=str(tmp_path)
        ).collect()
    }
    assert staged == plain


def test_multimodal_dedup_single_pass_plan(mm_corpus):
    """The verdict comes from a window, not a groupBy+join-back: the
    fingerprint pipeline must appear ONCE in the plan (no self-join
    would mean two corpus-scale computations)."""
    from horus_spark.operators.interleave import multimodal_dedup

    docs, media = mm_corpus
    plan = (
        multimodal_dedup(docs, media)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.lower().count("sha2") == 1  # media digest computed once
    assert "Window" in multimodal_dedup(docs, media)._jdf.queryExecution().executedPlan().toString()


# ---- incremental multimodal dedup ---------------------------------------


@pytest.fixture(scope="module")
def incr_corpus(spark):
    texts_x = [f"unique chunk number {i} words" for i in range(14)]
    texts_p = [f"prefixed other chunk {i} stuff" for i in range(14)]
    texts_c = [f"fresh batch chunk {i} content" for i in range(14)]

    def doc(did, texts, media_refs):
        spans, off = [], 0
        for i, t in enumerate(texts):
            spans.append(T(t, off)); off += 1
            if i < len(media_refs):
                spans.append(M("image", media_refs[i], off)); off += 1
        return (did, spans)

    mx = ["m0", "m1", "m2", "m3", "m4", "m5"]
    existing = _mk(
        spark,
        [doc("X", texts_x, mx), ("Y", [T("short other doc", 0)])],
    )
    batch = _mk(
        spark,
        [
            # exact clone of X via RENAMED equal-byte assets
            doc("bx", texts_x, ["r0", "r1", "r2", "r3", "r4", "r5"]),
            # identical pair, text not in the index (media same as X ->
            # jaccard vs X ~0.18, far below threshold)
            doc("p1", texts_p, mx),
            doc("p2", texts_p, mx),
            # X with ONE media payload swapped -> near_existing
            doc("nb", texts_x, ["m0", "m1", "m2", "m3", "m4", "mq"]),
            # fresh pair differing by one media payload -> near_batch
            doc("c1", texts_c, mx),
            doc("c2", texts_c, ["m0", "m1", "m2", "m3", "m4", "mq"]),
        ],
    )
    media = spark.createDataFrame(
        [("m%d" % i, "p%d" % i) for i in range(6)]
        + [("r%d" % i, "p%d" % i) for i in range(6)]  # renamed equal bytes
        + [("mq", "DIFFERENT")],
        "asset_id string, payload string",
    )
    return existing, batch, media


def test_incremental_multimodal_all_tiers(incr_corpus):
    from horus_spark.operators.interleave import (
        build_multimodal_index,
        incremental_multimodal_dedup,
    )

    existing, batch, media = incr_corpus
    index = build_multimodal_index(existing, media)
    got = {
        r["doc_id"]: (r["verdict"], r["partner_id"])
        for r in incremental_multimodal_dedup(
            batch, media, index, threshold=0.5
        ).collect()
    }
    assert got["bx"] == ("exact_existing", "X")   # rename-invariant
    assert got["p1"] == ("unique", None)
    assert got["p2"] == ("exact_batch", "p1")
    assert got["nb"] == ("near_existing", "X")    # 19/21 token jaccard
    assert got["c1"] == ("unique", None)
    assert got["c2"] == ("near_batch", "c1")


def test_extend_multimodal_index_roundtrip(incr_corpus, spark):
    """Uniques enter the rolling index; a later clone of one is then
    caught as exact_existing."""
    from horus_spark.operators.interleave import (
        build_multimodal_index,
        extend_multimodal_index,
        incremental_multimodal_dedup,
    )

    existing, batch, media = incr_corpus
    index = build_multimodal_index(existing, media)
    verdicts = incremental_multimodal_dedup(batch, media, index, threshold=0.5)
    extended = extend_multimodal_index(index, batch, media, verdicts)
    assert {r["id"] for r in extended.select("id").collect()} == {
        "X", "Y", "p1", "c1"
    }
    texts_c = [f"fresh batch chunk {i} content" for i in range(14)]
    spans, off = [], 0
    for i, t in enumerate(texts_c):
        spans.append(T(t, off)); off += 1
        if i < 6:
            spans.append(M("image", f"m{i}", off)); off += 1
    batch2 = _mk(spark, [("c1-clone", spans)])
    got = {
        r["doc_id"]: (r["verdict"], r["partner_id"])
        for r in incremental_multimodal_dedup(
            batch2, media, extended, threshold=0.5
        ).collect()
    }
    assert got["c1-clone"] == ("exact_existing", "c1")


def test_redact_spans_structure_preserved(spark):
    from horus_spark.operators.interleave import redact_spans

    docs = _mk(
        spark,
        [
            ("a", [T("mail bob@example.com and 10.0.0.1 here", 0),
                   M("image", "m1", 1),
                   T("clean text span", 2)]),
            ("b", [T("call +1 555-123-4567 now", 0)]),
            ("c", [T("nothing sensitive", 0)]),
            ("d", []),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in redact_spans(docs).collect()}
    a = {s["offset"]: s for s in got["a"]["spans"]}
    assert a[0]["text"] == "mail <EMAIL> and <IP> here"
    assert a[1]["media_ref"] == "m1" and a[1]["kind"] == "image"
    assert a[2]["text"] == "clean text span"     # untouched
    assert got["a"]["n_pii"] == 2
    assert "<PHONE>" in {s["offset"]: s for s in got["b"]["spans"]}[0]["text"]
    assert got["b"]["n_pii"] >= 1
    assert got["c"]["n_pii"] == 0
    assert got["d"]["n_pii"] == 0 and got["d"]["spans"] == []


def test_redact_spans_shuffle_free(mm_corpus):
    from horus_spark.operators.interleave import redact_spans

    docs, _ = mm_corpus
    plan = redact_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_segment_spans_next_fit(spark):
    """Hand fixture: windows close exactly when the next span would
    exceed the budget; spans never split; offset order honoured even
    when the array is shuffled."""
    from horus_spark.operators.interleave import segment_spans

    docs = _mk(
        spark,
        [
            # costs: 5, 64, 2, 64, 1 at budget 70 ->
            # win0 = {5, 64} (69), win1 = {2, 64, 1} (67)
            ("a", [T("one two three four five", 0), M("image", "m1", 1),
                   T("six seven", 2), M("video", "m2", 3),
                   T("eight", 4)]),
            # shuffled physical order, same offsets -> same windows
            ("a2", [T("eight", 4), M("image", "m1", 1),
                    T("one two three four five", 0), M("video", "m2", 3),
                    T("six seven", 2)]),
            # single oversize span still gets a window
            ("big", [M("image", "huge", 0)]),
            ("empty", []),
        ],
    )
    rows = segment_spans(docs, budget=70, media_token_cost=64).collect()
    got = {
        (r["doc_id"], r["offset"]): (r["win_id"], r["span_tokens"])
        for r in rows
    }
    for did in ("a", "a2"):
        assert got[(did, 0)] == (0, 5)
        assert got[(did, 1)] == (0, 64)
        assert got[(did, 2)] == (1, 2)
        assert got[(did, 3)] == (1, 64)
        assert got[(did, 4)] == (1, 1)
    assert got[("big", 0)] == (0, 64)
    assert not any(r["doc_id"] == "empty" for r in rows)


def test_segment_spans_budget_invariant(mm_corpus):
    """Every window's token total respects the budget unless it holds a
    single oversize span; window ids are contiguous from 0 per doc."""
    from horus_spark.operators.interleave import segment_spans

    docs, _ = mm_corpus
    rows = segment_spans(docs, budget=10, media_token_cost=4).collect()
    by_win = {}
    for r in rows:
        by_win.setdefault((r["doc_id"], r["win_id"]), []).append(
            r["span_tokens"]
        )
    for (_, _), costs in by_win.items():
        assert sum(costs) <= 10 or len(costs) == 1
    by_doc = {}
    for (did, win), _ in by_win.items():
        by_doc.setdefault(did, set()).add(win)
    for wins in by_doc.values():
        assert wins == set(range(len(wins)))


def test_segment_spans_guards(mm_corpus):
    from horus_spark.operators.interleave import segment_spans

    docs, _ = mm_corpus
    with pytest.raises(ValueError):
        segment_spans(docs, budget=0)
    with pytest.raises(ValueError):
        segment_spans(docs, media_token_cost=-1)


def test_multimodal_keep_best_composition(neardup_corpus):
    """q100 shape: fuzzy pairs -> cluster closure -> textiest-copy
    winner; every doc verdicted, exactly one keep per cluster."""
    from horus_spark.operators.components import keep_best_per_cluster
    from horus_spark.operators.interleave import (
        interleave_token_costs,
        multimodal_minhash_pairs,
    )

    docs, media = neardup_corpus
    pairs = multimodal_minhash_pairs(docs, media, threshold=0.5)
    quality = interleave_token_costs(docs).select("doc_id", "n_text_tokens")
    got = {
        r["doc_id"]: r.asDict()
        for r in keep_best_per_cluster(quality, pairs, "n_text_tokens").collect()
    }
    # A, B, C form one cluster (A-B, A-C, B-C pairs); D is a singleton
    assert got["A"]["cluster_size"] == 3
    assert {got[d]["cluster_id"] for d in "ABC"} == {got["A"]["cluster_id"]}
    keeps = [d for d in "ABC" if got[d]["keep"]]
    assert keeps == ["A"]  # equal token counts -> min id wins
    assert got["D"]["keep"] and got["D"]["cluster_size"] == 1


def test_null_media_ref_does_not_collapse_to_empty(mm_corpus, spark):
    """A NULL media_ref must not NULL the fingerprint fold (which would
    collapse the doc onto md5(''), the empty-doc fingerprint)."""
    _, media = mm_corpus
    docs = _mk(
        spark,
        [
            ("n1", [T("real content here", 0), M("image", None, 1)]),
            ("n2", [T("real content here", 0), M("image", None, 1)]),
            ("e", []),
            ("t", [T("real content here", 0)]),
        ],
    )
    fp = _fps(docs, media)
    assert fp["n1"] is not None
    assert fp["n1"] != fp["e"]     # not the empty fingerprint
    assert fp["n1"] != fp["t"]     # the null-ref span still contributes
    assert fp["n1"] == fp["n2"]    # deterministic across docs


def test_rewrite_media_refs_malformed_offsets(mm_corpus, spark):
    """NULL or duplicate offsets in rewritable media spans must not
    crash the rewrite (collect_list drops NULL keys -> mismatched
    map_from_arrays arrays; duplicate keys -> map exception)."""
    from horus_spark.operators.interleave import rewrite_media_refs

    docs, _ = mm_corpus
    mapping = docs.sparkSession.createDataFrame(
        [("m2", "m1")], "asset_id string, canonical_id string"
    )
    bad = _mk(
        spark,
        [
            ("x", [T("t", 0), ("image", "", "m2", None)]),       # NULL offset
            ("y", [("image", "", "m2", 1), ("video", "", "m2", 1)]),  # dup
        ],
    )
    got = {r["doc_id"]: r["spans"] for r in rewrite_media_refs(bad, mapping).collect()}
    # NULL-offset span passes through unchanged (cannot be addressed)
    assert [s["media_ref"] for s in got["x"] if s["kind"] != "text"] == ["m2"]
    # duplicate offsets both resolve (same canonical), no exception
    assert {s["media_ref"] for s in got["y"]} == {"m1"}


def test_build_multimodal_index_staging_parity(incr_corpus, tmp_path):
    from horus_spark.operators.interleave import build_multimodal_index

    existing, _, media = incr_corpus
    plain = {
        r["id"]: (r["content_md5"], r["sig"])
        for r in build_multimodal_index(existing, media).collect()
    }
    staged = {
        r["id"]: (r["content_md5"], r["sig"])
        for r in build_multimodal_index(
            existing, media, staging_dir=str(tmp_path)
        ).collect()
    }
    assert staged == plain
