"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the extraction pipeline (docs/sec — the north-rule metric)
over a pre-materialized synthetic corpus, plus representative relational /
dedup / ANN queries over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS].

The synthetic corpus is generated once to /tmp (deterministic, seeded) so
the timed section measures the PIPELINE, not corpus generation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("HORUS_BENCH_DOCS", "50000"))
CORPUS_DIR = os.environ.get("HORUS_BENCH_CORPUS", f"/tmp/horus_bench_corpus_{N_DOCS}")


def materialize_corpus(spark, n_docs: int, path: str):
    from pyspark.sql import functions as F

    if not (
        os.path.exists(os.path.join(path, "documents", "_SUCCESS"))
        and os.path.exists(os.path.join(path, "ocr_words", "_SUCCESS"))
    ):
        from horus_spark.fixtures.generator import corpus_spark

        c = corpus_spark(spark, n_docs, partitions=max(CPUS, 8))
        c["documents"].write.mode("overwrite").parquet(os.path.join(path, "documents"))
        c["ocr_words"].write.mode("overwrite").parquet(os.path.join(path, "ocr_words"))
    # round 4: pre-built HTML pages (one per document, synthesize_html
    # template over the doc's text spans) so the html_* timings measure
    # EXTRACTION, not page synthesis
    if not os.path.exists(os.path.join(path, "pages", "_SUCCESS")):
        from horus_spark.operators.html import synthesize_html

        d = spark.read.parquet(os.path.join(path, "documents"))
        txt = d.select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(
                    F.filter(
                        F.col("spans"), lambda s: s["kind"] == F.lit("text")
                    ),
                    lambda s: s["text"],
                ),
            ).alias("text"),
        )
        synthesize_html(txt).write.mode("overwrite").parquet(
            os.path.join(path, "pages")
        )


def main():
    from pyspark.sql import functions as F

    from horus_spark.pipeline import run_extraction
    from horus_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="horus_bench",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    materialize_corpus(spark, N_DOCS, CORPUS_DIR)
    documents = spark.read.parquet(os.path.join(CORPUS_DIR, "documents"))
    ocr_words = spark.read.parquet(os.path.join(CORPUS_DIR, "ocr_words"))

    # extraction throughput: logical plan built once (driver py4j cost,
    # amortizes in production), then a FRESH QueryExecution per run so no
    # shuffle map stage is reused (re-counting one RDD graph would skip the
    # whole pipeline up to the last shuffle); warm-ups cover JIT/codegen/
    # Arrow paths/python-worker fork
    def make_runner(df):
        """Fresh-QueryExecution runner: re-executing one DataFrame would
        reuse its shuffle map outputs and broadcasts, timing only the
        final stage. Falls back to plain count() with a warning if
        Spark's private Dataset API moves (packages changed 3.x -> 4.x)."""
        try:
            jlogical = df._jdf.logicalPlan()
            dataset_cls = spark._jvm.org.apache.spark.sql.classic.Dataset

            def one_run() -> int:
                return (
                    dataset_cls.ofRows(spark._jsparkSession, jlogical)
                    .queryExecution()
                    .toRdd()
                    .count()
                )

            one_run()
            return one_run
        except Exception:
            print(
                "WARNING: fresh-QueryExecution helper unavailable; falling "
                "back to df.count() (shuffle reuse may inflate throughput)",
                file=sys.stderr,
            )
            return df.count

    # every timed entry: 1 warm run (JIT/codegen/Arrow/python-worker fork)
    # + N fresh-QE timed runs, report min (this host's hypervisor steal is
    # bursty one-sided noise; the driver records a single bench invocation)
    def timed_min(one_run, n=2) -> float:
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            one_run()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    extracted = run_extraction(documents, ocr_words)
    ext_run = make_runner(extracted)
    n_extracted = ext_run()  # warm (the make_runner probe was the fork-warmup)
    timings: dict[str, float] = {}
    timings["extract_pipeline"] = timed_min(ext_run, n=3)
    docs_per_sec = round(n_extracted / timings["extract_pipeline"], 1)

    # round 4: HTML tier throughput over the pre-built 50k-page corpus
    # (north-rule capability: boilerplate strip / main-content recovery)
    from horus_spark.operators.html import dom_extract, html_blocks

    pages = spark.read.parquet(os.path.join(CORPUS_DIR, "pages"))
    html_run = make_runner(dom_extract(pages))
    n_pages = html_run()  # warm (probe run in make_runner was fork-warmup)
    timings["html_dom_extract"] = timed_min(html_run, n=2)
    pages_per_sec = round(n_pages / timings["html_dom_extract"], 1)
    flat_run = make_runner(html_blocks(pages))
    timings["html_flat_screen"] = timed_min(flat_run, n=2)

    qs = entrymod.queries()
    headline = [
        "q01_pricing_summary",
        "q02_totals_chain",
        "q04_region_revenue",
        "q05_versioning",
        "q21_minhash_pairs",  # the at-scale near-dup path; q11's exact
        # inverted-index tier stays a small-sf oracle-parity query only
        "q16_simhash",
        "q17_ann_topk",
        "q34_quantized_ann",  # round 3: the int8 two-tier ANN scale path
        "q39_ivf_quantized_ann",  # round 4: IVF-SQ — cell-pruned int8 tier
        "q120_ivf_pq_ann",  # round 4: IVF-PQ — product codes + integer ADC
        "q88_interleave_stats",  # round 4: interleaved-corpus map-side fold
        "q90_multimodal_dedup",  # round 4: content-addressed multimodal dedup
        "q142_classifier",  # round 4: hashed quality classifier train+apply
    ]
    for name in headline:
        runner = make_runner(qs[name](spark, SF_DIR))  # probe run warms
        timings[name] = timed_min(runner, n=2)

    # q122 BPE training is ITERATIVE (localCheckpoint truncation per
    # merge round): a fresh QueryExecution from one cached plan would
    # reuse the checkpointed round RDDs and time only the tail, so it
    # is timed by rebuilding the WHOLE plan per run (plan-build py4j
    # cost included — it is part of an iterative driver's real cost).
    def bpe_fresh() -> int:
        return qs["q122_bpe_train"](spark, SF_DIR).count()

    bpe_fresh()  # warm
    timings["q122_bpe_train_fresh"] = timed_min(bpe_fresh, n=2)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline seconds (extraction pipeline + relational/dedup/ANN set)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "extra": {
                    "extraction_docs": n_extracted,
                    "extraction_docs_per_sec": docs_per_sec,
                    # round-4 additions (subtract html_* keys when
                    # comparing totals to rounds 1-3)
                    "html_pages": n_pages,
                    "html_dom_pages_per_sec": pages_per_sec,
                    "cpus": CPUS,
                    # round-2 protocol change (disclosed for cross-round
                    # comparison): every query now reports min of N
                    # fresh-QueryExecution runs after one warm run —
                    # steady-state timing with no shuffle/broadcast reuse;
                    # round 1 reported single cold runs (JIT + codegen
                    # compile time included)
                    "protocol": "per query: 1 warm + min of 2-3 fresh-QE runs",
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
