"""One arm of the per-doc-timer A/B (verdict-r3 ask #9).

Runs ONLY the extract_pipeline bench leg, exactly under bench.py's
protocol (same corpus, same fresh-QueryExecution runner, 1 warm + min of
N), honoring HORUS_SPARK_TIME_DOCS — run it alternately with the gate on
and off so one-sided host noise hits both arms:

    for i in 1 2 3; do
      HORUS_SPARK_TIME_DOCS=1 python tools/bench_ab_timer.py
      HORUS_SPARK_TIME_DOCS=0 python tools/bench_ab_timer.py
    done

Prints one JSON line {"timing": "on"|"off", "min_s": ..., "runs": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # reuse corpus + runner protocol


def main():
    from horus_spark.pipeline import run_extraction
    from horus_spark.session import get_spark

    spark = get_spark(
        app_name="horus_ab_timer",
        master=f"local[{bench.CPUS}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.materialize_corpus(spark, bench.N_DOCS, bench.CORPUS_DIR)
    documents = spark.read.parquet(os.path.join(bench.CORPUS_DIR, "documents"))
    ocr_words = spark.read.parquet(os.path.join(bench.CORPUS_DIR, "ocr_words"))

    extracted = run_extraction(documents, ocr_words)
    jlogical = extracted._jdf.logicalPlan()
    dataset_cls = spark._jvm.org.apache.spark.sql.classic.Dataset

    def one_run() -> int:
        return (
            dataset_cls.ofRows(spark._jsparkSession, jlogical)
            .queryExecution()
            .toRdd()
            .count()
        )

    one_run()  # warm: JIT/codegen/Arrow/python-worker fork
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        one_run()
        runs.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "timing": "off"
                if os.environ.get("HORUS_SPARK_TIME_DOCS", "1") == "0"
                else "on",
                "min_s": min(runs),
                "runs": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
