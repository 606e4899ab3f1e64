"""End-to-end RETRIEVAL over a crawled corpus — ingest to hybrid
search, each stage a horus_spark operator:

    raw pages -> DOM main-content extraction (dom_extract)
    -> heading-keyed section chunks (section_chunks) with outline
       titles (page_outline)
    -> lexical tier: MaxScore-pruned BM25 over the chunks
       (maxscore_topk — bit-identical to the exhaustive scorer,
       dynamic pruning does the work)
    -> dense tier: brute-force cosine top-k over the embeddings table
       (brute_force_topk; swap in ivf_topk / quantized tiers at scale)
    -> hybrid fusion: reciprocal-rank fusion (rrf_fuse)
    -> sentence-level answers: split_sentences + readability gate

Runs locally in under a minute:

    python examples/retrieval_pipeline.py [sf_dir]

(default sf_dir: /root/testdata/sf0.001). Page synthesis is the demo's
INPUT setup; every stage below it is the library API.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import horus_spark as h  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from horus_spark.operators.html import dom_extract, section_chunks
    from horus_spark.operators.ranking import (
        bm25_topk,
        maxscore_topk,
        rrf_fuse,
    )
    from horus_spark.operators.sentences import readability, split_sentences
    from horus_spark.operators.similarity import brute_force_topk

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = h.get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages = h.synthesize_html(docs)
    print(f"pages: {pages.count()}")

    # ---- extraction: DOM tier main content --------------------------
    content = dom_extract(pages)
    print(f"extracted docs: {content.count()}")

    # ---- chunking: author-structure sections ------------------------
    sections = section_chunks(pages).where(F.col("section_text") != "")
    n_sec = sections.count()
    print(f"retrieval chunks (sections): {n_sec}")
    chunks = sections.select(
        F.concat_ws(
            "#", "doc_id", F.col("section_pos").cast("string")
        ).alias("chunk_id"),
        F.concat_ws(
            " ", F.coalesce("heading_text", F.lit("")), "section_text"
        ).alias("text"),
    )

    # ---- lexical tier: MaxScore-pruned BM25 -------------------------
    query = "customer order line total"
    lex = maxscore_topk(chunks, query, id_col="chunk_id", k=10)
    brute = bm25_topk(chunks, query, id_col="chunk_id", k=10)
    same = [tuple(r) for r in lex.collect()] == [
        tuple(r) for r in brute.collect()
    ]
    print(f"lexical top-10 (pruned == exhaustive: {same}):")
    for r in lex.limit(3).collect():
        print(f"  {r['chunk_id']:>10}  score={r['score']}")
    assert same, "MaxScore must reproduce the exhaustive ranking"

    # ---- dense tier: cosine top-k over embeddings -------------------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = emb.limit(1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dense = brute_force_topk(emb, qvec, k=10)
    print(f"dense top-k rows: {dense.count()}")

    # ---- hybrid fusion: RRF over the two rankings -------------------
    import pyspark.sql.window as W

    lex_ranked = lex.select(
        F.col("chunk_id").alias("id"),
        F.row_number()
        .over(W.Window.orderBy(F.desc("score"), F.asc("chunk_id")))
        .alias("rank"),
    )
    # map dense doc hits onto their first section chunk for the demo
    dense_ranked = dense.select(
        F.concat_ws(
            "#", F.col("neighbor_id").cast("string"), F.lit("1")
        ).alias("id"),
        F.col("rank"),
    )
    fused = rrf_fuse([lex_ranked, dense_ranked], topk=10)
    print("hybrid top-5 (RRF):")
    for r in fused.limit(5).collect():
        print(f"  {r['id']:>10}  rrf={r['rrf_score']:.6f}  lists={r['n_lists']}")

    # ---- answer surface: sentences of the top chunk, quality-gated --
    top_chunk = fused.limit(1).collect()[0]["id"]
    top_doc = top_chunk.split("#")[0]
    sents = split_sentences(
        content.where(F.col("doc_id") == top_doc),
        text_col="content_text",
    )
    scored = readability(
        content.where(F.col("doc_id") == top_doc), text_col="content_text"
    ).collect()
    print(
        f"top doc {top_doc}: {sents.count()} sentences, "
        f"flesch_milli={scored[0]['flesch_milli'] if scored else None}"
    )
    print("retrieval pipeline complete.")


if __name__ == "__main__":
    main()
