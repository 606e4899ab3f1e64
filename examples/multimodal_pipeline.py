"""End-to-end MULTIMODAL curation over an interleaved text+media corpus
— the interleaved-document analog of training_data_pipeline.py, each
stage one horus_spark operator:

    structure stats -> media referential audit -> asset-store dedup +
    canonical ref rewrite -> exact multimodal dedup (content-addressed)
    -> fuzzy multimodal near-dup (minhash over span tokens) w/ cluster
    closure -> caption-pair mining -> modality-routed mixture -> span
    PII redaction -> window segmentation + sequence packing ->
    incremental re-crawl dedup vs the rolling index

Runs locally in ~1 minute:

    python examples/multimodal_pipeline.py [sf_dir]

(default sf_dir: /root/testdata/sf0.001). The span construction and the
synthetic asset store are the demo's INPUT setup (a real deployment
reads an existing interleaved table); every stage below them is the
library API.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import horus_spark as h  # noqa: E402


def build_interleaved(docs):
    """Demo input: split each document's text into 12-token chunks and
    interleave a media span after every third chunk (media_ref =
    'asset-<doc>-<i>'), offsets 0..n-1 in document order."""
    from pyspark.sql import functions as F

    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.greatest(F.ceil(F.size(toks) / 12).cast("int"), F.lit(1))
    text_spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.concat_ws(" ", F.slice(toks, (i * 12 + 1).cast("int"), 12)).alias("text"),
            F.lit("").alias("media_ref"),
            (i * 2).cast("int").alias("offset"),
        ),
    )
    media_spans = F.filter(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.when(
                i % 3 == 2,
                F.struct(
                    F.when((F.col("doc_id") + i) % 2 == 0, F.lit("image"))
                    .otherwise(F.lit("video"))
                    .alias("kind"),
                    F.lit("").alias("text"),
                    F.concat(
                        F.lit("asset-"),
                        F.col("doc_id").cast("string"),
                        F.lit("-"),
                        i.cast("string"),
                    ).alias("media_ref"),
                    (i * 2 + 1).cast("int").alias("offset"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    merged = F.array_sort(
        F.concat(text_spans, media_spans),
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    spans = F.transform(
        merged,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans")
    )


def main() -> None:
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = h.get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id",
        # plant PII in a slice so the compliance stage has work to do
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(F.col("text"), F.lit(" contact staff@example.com or 10.1.2.3")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # plant duplicates: +1M clones keep media content; +2M+1 clones keep
    # the text but flip every media payload (near-dups, not exact dups)
    c_exact = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    c_near = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2_000_001).alias("doc_id"), "text"
    )
    spans = build_interleaved(
        base.unionByName(c_exact).unionByName(c_near)
    ).localCheckpoint()
    n0 = spans.count()

    # synthetic asset store: content class = (doc % 25, chunk index), so
    # clones at +1M share bytes and clones at +2M+1 do not; drop the i=5
    # assets to plant dangling refs
    sp = F.split(F.col("asset_id"), "-")
    refs = (
        spans.select(
            F.explode(
                F.filter(F.col("spans"), lambda s: s["kind"] != F.lit("text"))
            ).alias("s")
        )
        .select(F.col("s.media_ref").alias("asset_id"))
        .distinct()
    )
    media = refs.filter(F.element_at(sp, 3) != "5").select(
        "asset_id",
        F.concat(
            F.lit("blob-"),
            (F.element_at(sp, 2).cast("long") % 25).cast("string"),
            F.lit("-"),
            F.element_at(sp, 3),
        ).alias("payload"),
    ).localCheckpoint()

    # 1. structure stats: how interleaved is the corpus?
    stats = h.interleave_stats(spans)
    s = stats.agg(
        F.sum("n_media").alias("media"),
        F.sum("n_text").alias("text"),
        F.max("max_text_run").alias("run"),
    ).collect()[0]
    print(f"interleaved docs        : {n0} ({s['text']} text / {s['media']} media spans)")

    # 2. referential audit (payload bytes never read)
    audit = h.media_integrity(spans, media)
    a = {r["status"]: r["n"] for r in audit.groupBy("status").agg(F.count("*").alias("n")).collect()}
    print(f"dangling refs / orphans : {a.get('dangling_ref', 0)} / {a.get('orphan_asset', 0)}")

    # 3. asset-store dedup + canonical ref rewrite
    mapping = h.dedup_assets(media)
    reclaim = mapping.agg(F.sum("reclaim_bytes").alias("b")).collect()[0]["b"]
    spans_c = h.rewrite_media_refs(spans, mapping.select("asset_id", "canonical_id"))
    print(f"asset reclaim           : {reclaim} bytes after canonical rewrite")

    # 4. exact multimodal dedup (content-addressed: text AND media bytes)
    verdicts = h.multimodal_dedup(spans_c, media)
    keep_exact = verdicts.filter(F.col("doc_id") == F.col("canonical_id"))
    spans1 = spans_c.join(keep_exact.select("doc_id"), "doc_id", "left_semi")
    n1 = spans1.count()
    print(f"exact multimodal dedup  : {n0} -> {n1}")

    # 5. fuzzy near-dup tier: one-image-swapped / media-flipped twins
    pairs = h.multimodal_minhash_pairs(spans1, media, threshold=0.5)
    comps = h.connected_components(pairs.select("id_a", "id_b"))
    losers = comps.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    spans2 = spans1.join(losers, "doc_id", "left_anti")
    n2 = spans2.count()
    print(f"fuzzy multimodal dedup  : {n1} -> {n2}")

    # 6. caption-pair mining for image-text training
    caps = h.caption_pairs(spans2, min_tokens=2, max_tokens=64)
    print(f"caption pairs mined     : {caps.count()}")

    # 7. modality-routed mixture over multimodal token masses
    mix = h.modality_mixture(spans2, token_budget=1_000_000)
    for r in mix.orderBy("domain").collect():
        print(
            f"mixture {r['domain']:<17}: {r['n_docs']} docs, "
            f"{r['n_tokens']} tokens -> p_mix {r['p_mix']}"
        )

    # 8. compliance pass: span-level PII redaction (structure preserved,
    #    so everything downstream runs on the redacted corpus unchanged)
    from horus_spark.operators.interleave import redact_spans, segment_spans

    spans3 = redact_spans(spans2)
    n_flagged = spans3.filter(F.col("n_pii") > 0).count()
    spans3 = spans3.drop("n_pii")
    print(f"docs with PII redacted  : {n_flagged}")

    # 9. within-doc window segmentation (VLM samples: contiguous span
    #    slices, spans never split) + whole-doc sequence packing
    segs = segment_spans(spans3, budget=512)
    n_windows = segs.select("doc_id", "win_id").distinct().count()
    costs = h.interleave_token_costs(spans3)
    packed = h.pack_sequences(costs, "doc_id", "n_tokens", budget=2048, n_shards=8)
    n_seqs = packed.select("shard", "seq_id").distinct().count()
    print(f"training windows / seqs : {n_windows} (512) / {n_seqs} (2048)")

    # 10. continuous ingestion: a later crawl probes the rolling index
    #    instead of re-scanning the corpus — a re-crawled slice is
    #    caught as exact_existing without touching corpus spans/payloads
    index = h.build_multimodal_index(spans2, media)
    recrawl = spans2.filter(F.col("doc_id").cast("long") % 7 == 0).select(
        F.concat(F.col("doc_id"), F.lit("-recrawl")).alias("doc_id"), "spans"
    )
    verdicts = h.incremental_multimodal_dedup(recrawl, media, index)
    v = {r["verdict"]: r["n"] for r in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()}
    print(f"re-crawl batch verdicts : {v}")

    spark.stop()


if __name__ == "__main__":
    main()
