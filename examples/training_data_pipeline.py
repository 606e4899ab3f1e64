"""A full training-data curation pipeline over the documents table —
the sequence a 100 TB pretraining corpus actually goes through, each
stage one horus_spark operator:

    exact dedup -> fuzzy (minhash) dedup w/ cluster closure ->
    benchmark decontamination (bloom tier) -> PII redaction ->
    quality gates (unigram-LM score + heuristics + duplicated-passage
    fraction) -> train/val/test split -> token-window chunking ->
    sequence packing -> global sequence numbering (shard cursors)

Runs locally in ~1 minute:

    python examples/training_data_pipeline.py [sf_dir]

(default sf_dir: /root/testdata/sf0.001). Every stage is the library
API; the same script is a spark-submit job at fleet scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import horus_spark as h  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = h.get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("doc_id", F.col("doc_id").cast("string"))
    )
    n0 = docs.count()

    # 1. exact dedup: one canonical doc per byte-identical text
    exact = h.exact_dedup(docs, id_col="doc_id", text_col="text")
    docs1 = docs.join(
        exact.filter(~F.col("is_duplicate")).select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )

    # 2. fuzzy dedup: minhash candidate pairs -> connected components ->
    #    keep each cluster's minimum id
    pairs = h.minhash_dedup_pairs(docs1, id_col="doc_id", text_col="text")
    comps = h.connected_components(pairs)
    losers = comps.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    docs2 = docs1.join(losers, "doc_id", "left_anti")

    # 3. decontamination vs a benchmark slice (bloom pre-filter tier)
    bench = docs.filter(F.col("doc_id").cast("long") % 97 == 0)
    contam = h.bloom_decontaminate(docs2, bench, n=8)
    docs3 = docs2.join(
        contam.filter(~F.col("is_contaminated")).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 4. PII redaction (map-side rewrite; keeps all other columns)
    docs4 = h.redact_pii(docs3).drop("text").withColumnRenamed("redacted", "text")

    # 5. quality gates: corpus-LM score + duplicated-passage fraction
    lm = h.lm_score(docs4)
    dup = h.duplicate_paragraph_stats(docs4, window=8)
    gates = lm.join(dup, "doc_id").filter(
        (F.col("n_tokens") >= 5) & (F.col("dup_frac") <= 0.5)
    )
    docs5 = docs4.join(gates.select("doc_id"), "doc_id", "left_semi")

    # 6. deterministic split: labels are a pure function of doc_id, so
    #    they survive corpus growth (no leakage when the crawl refreshes)
    docs6 = h.split_assign(docs5, "doc_id")
    train = docs6.filter(F.col("split") == "train")

    # 7. chunk to training windows, then pack to a token budget
    chunks = h.chunk_documents(train, window=64, stride=64).withColumn(
        "chunk_key", F.concat_ws("#", "doc_id", F.col("chunk_id").cast("string"))
    )
    packed = h.pack_sequences(
        chunks, "chunk_key", "n_tokens", budget=256, n_shards=8
    )

    # 8. global sequence numbering: a stable cursor over the packed
    #    corpus (resume points, shard boundary math) with no
    #    single-task sort
    seqs = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens")
    )
    numbered = h.global_row_number(
        seqs.withColumn(
            "order_key",
            F.col("shard").cast("long") * 1_000_000_000
            + F.col("seq_id").cast("long"),
        ),
        ["order_key"],
        out_col="global_seq",
    )

    n5, nc = docs5.count(), chunks.count()
    npk = numbered.count()
    splits = {
        r["split"]: r["n"]
        for r in docs6.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"documents in           : {n0}")
    print(f"after exact dedup      : {docs1.count()}")
    print(f"after fuzzy dedup      : {docs2.count()}")
    print(f"after decontamination  : {docs3.count()}")
    print(f"after quality gates    : {n5}")
    print(f"split sizes            : {splits}")
    print(f"training chunks        : {nc}")
    print(f"packed+numbered seqs   : {npk}")

    # ---- pretraining mask plans over the kept docs ------------------
    from horus_spark.operators.masking import ul2_denoiser_plan

    ul2 = ul2_denoiser_plan(docs5)
    mix = {
        r["denoiser"]: r["n"]
        for r in ul2.groupBy("denoiser")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"UL2 mask spans (R/S/X) : {mix}")
    spark.stop()


if __name__ == "__main__":
    main()
