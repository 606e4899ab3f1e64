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
    if os.path.exists(os.path.join(path, "documents", "_SUCCESS")) and os.path.exists(
        os.path.join(path, "ocr_words", "_SUCCESS")
    ):
        return
    from horus_spark.fixtures.generator import corpus_spark

    c = corpus_spark(spark, n_docs, partitions=max(CPUS, 8))
    c["documents"].write.mode("overwrite").parquet(os.path.join(path, "documents"))
    c["ocr_words"].write.mode("overwrite").parquet(os.path.join(path, "ocr_words"))


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
    extracted = run_extraction(documents, ocr_words)
    try:
        # private Spark 4.x internals (moved packages across 3.x/4.x): build
        # a FRESH QueryExecution per run so no shuffle map output is reused
        jlogical = extracted._jdf.logicalPlan()
        dataset_cls = spark._jvm.org.apache.spark.sql.classic.Dataset

        def one_run() -> int:
            return (
                dataset_cls.ofRows(spark._jsparkSession, jlogical)
                .queryExecution()
                .toRdd()
                .count()
            )

        one_run()
    except Exception:
        print(
            "WARNING: fresh-QueryExecution helper unavailable on this Spark; "
            "falling back to df.count() (shuffle reuse may inflate throughput)",
            file=sys.stderr,
        )

        def one_run() -> int:
            return extracted.count()

    n_extracted = one_run()
    one_run()

    timings: dict[str, float] = {}
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        one_run()
        runs.append(time.perf_counter() - t0)
    timings["extract_pipeline"] = round(sorted(runs)[1], 3)
    docs_per_sec = round(n_extracted / timings["extract_pipeline"], 1)

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
    ]
    for name in headline:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
                    "cpus": CPUS,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
