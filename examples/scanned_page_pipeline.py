"""Scanned-document rehabilitation — the OCR/PDF repair tier driven as
one pipeline, each stage a horus_spark operator:

    raw word boxes (skewed, two-column, line-wrapped)
    -> deskew: integer least-squares slope per page + shear
       (operators/deskew.estimate_skew)
    -> column detection + reading order: interval-union gutter sweep
       (operators/reading_order.column_reading_order)
    -> line assembly in reading order
    -> de-hyphenation line-break repair (operators/textfix.dehyphenate)
    -> repaired text feeds the tokenizer tier: BPE merges learned from
       the recovered corpus (operators/bpe.bpe_train / bpe_segment)
    -> OCR-noise audit: SymSpell edit-1 variant mining over the
       recovered vocabulary (operators/fuzzy.edit1_pairs)

Runs locally in under a minute:

    python examples/scanned_page_pipeline.py [sf_dir]

(default sf_dir: /root/testdata/sf0.001). Page synthesis is the demo's
INPUT setup — a real deployment reads the OCR scan's word boxes; every
stage below it is the library API.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import horus_spark as h  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from horus_spark.operators.bpe import bpe_segment, bpe_train
    from horus_spark.operators.deskew import estimate_skew
    from horus_spark.operators.fuzzy import edit1_pairs
    from horus_spark.operators.reading_order import column_reading_order
    from horus_spark.operators.textfix import dehyphenate

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = h.get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # ---- input setup: word boxes on skewed two-column pages ---------
    words = F.filter(
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
        lambda w: w != "",
    )
    base = docs.select(
        "doc_id", F.posexplode(words).alias("i", "word")
    )
    # fragment = word triple; two columns; per-doc skew up to ±3%
    frag = base.withColumn("frag_id", (F.col("i") / 3).cast("int"))
    sm = "(((doc_id % 13) - 6) * 5000)"
    col_idx = F.col("frag_id") % 2
    x0 = 1.0 + col_idx * 3.5 + (F.col("i") % 3) * 0.6
    y_line = 1.0 + F.floor(F.col("frag_id") / 2) * 0.3
    boxes = frag.select(
        "doc_id",
        F.lit(0).alias("page"),
        "frag_id",
        "word",
        x0.alias("x0"),
        (x0 + 0.5).alias("x1"),
        (
            y_line
            + F.expr(f"{sm} * (1.0 + (frag_id % 2) * 3.5 + (i % 3) * 0.6)")
            / 1e6
        ).alias("y0"),
    ).withColumn("y1", F.col("y0") + 0.2)

    # ---- 1. deskew ---------------------------------------------------
    centers = boxes.select(
        "doc_id", "page",
        ((F.col("x0") + F.col("x1")) / 2).alias("xc"),
        ((F.col("y0") + F.col("y1")) / 2).alias("yc"),
    )
    skew = estimate_skew(centers)
    print("== deskew (5 pages):")
    skew.orderBy("doc_id").show(5, truncate=False)

    # shear the boxes with the estimated slope before layout analysis
    sheared = boxes.join(
        skew.select("doc_id", "page", "slope_ppm"), ["doc_id", "page"]
    ).select(
        "doc_id", "page", "frag_id", "word", "x0", "x1",
        (F.col("y0") - F.col("slope_ppm") * F.col("x0") / 1e6).alias("y0"),
        (F.col("y1") - F.col("slope_ppm") * F.col("x1") / 1e6).alias("y1"),
    )

    # ---- 2. columns + reading order ---------------------------------
    frags = (
        sheared.groupBy("doc_id", "page", "frag_id")
        .agg(
            F.min("x0").alias("x0"), F.max("x1").alias("x1"),
            F.min("y0").alias("y0"), F.max("y1").alias("y1"),
            F.concat_ws(
                " ", F.transform(F.array_sort(F.collect_list(F.struct("x0", "word"))), lambda s: s["word"])
            ).alias("line_text"),
        )
    )
    ordered = column_reading_order(frags)
    print("== reading order (doc 1, first 6 fragments):")
    ordered.where(F.col("doc_id") == 1).orderBy("read_ord").select(
        "read_ord", "col_idx", "n_columns", "line_text"
    ).show(6, truncate=60)

    # ---- 3. line assembly + de-hyphenation ---------------------------
    # reading-order text, then re-wrapped print-style: hard wrap every
    # 4 words, and every 7th long word hyphen-split across the break —
    # the raw shape a narrow-column OCR emits
    otext = ordered.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("read_ord", "line_text"))
                ),
                lambda s: s["line_text"],
            ),
        ).alias("otext")
    )
    owords = F.filter(F.split(F.trim("otext"), r"\s+"), lambda w: w != "")

    def _piece(w, i):
        h2 = F.floor(F.length(w) / 2).cast("int")
        split_ok = (
            (i % 7 == F.lit(3))
            & (F.length(w) >= 4)
            & w.substr(h2, F.lit(1)).rlike("^[A-Za-z]$")
            & w.substr(h2 + 1, F.lit(1)).rlike("^[a-z]$")
        )
        return (
            F.when(
                split_ok,
                F.concat(
                    w.substr(F.lit(1), h2), F.lit("-\n"),
                    w.substr(h2 + 1, F.length(w)),
                ),
            )
            .when((i + 1) % 4 == F.lit(0), F.concat(w, F.lit("\n")))
            .otherwise(w)
        )

    wrapped = otext.select(
        "doc_id",
        F.filter(
            F.transform(
                F.split(F.array_join(F.transform(owords, _piece), " "), "\n"),
                lambda x: F.trim(x),
            ),
            lambda x: x != "",
        ).alias("lines"),
    )
    repaired = dehyphenate(wrapped)
    print("== repaired text (2 docs):")
    repaired.orderBy("doc_id").select(
        "doc_id", "n_joins", F.substring("text_repaired", 1, 70).alias("head")
    ).show(2, truncate=False)

    # ---- 4. tokenizer tier over the recovered corpus -----------------
    corpus = repaired.select(
        "doc_id", F.col("text_repaired").alias("text")
    )
    merges = bpe_train(corpus, n_merges=4).orderBy("merge_rank").collect()
    print("== learned BPE merges:")
    for m in merges:
        print(f"   {m['merge_rank']}: {m['left']!r} + {m['right']!r} "
              f"(count {m['pair_count']})")
    seg = bpe_segment(corpus, merges)
    print(f"== segmented words: {seg.count()}")

    # ---- 5. OCR-noise audit ------------------------------------------
    toks = corpus.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    pairs = edit1_pairs(toks)
    print(f"== edit-distance-1 vocabulary pairs: {pairs.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
