"""Two-parallelism scaling bench (the north rule's N vs 4N executors,
sandbox proxy: local[8] vs local[32] on the SAME input).

Protocol (BASELINE.md): deterministic seeded corpus (default 100k docs,
skewed 1..17-line distribution) materialized to parquet first (generation
excluded); each level runs in its OWN subprocess (fresh JVM, no cross-level
JIT/heap pollution); the extraction DataFrame is planned once and its
physical plan re-executed via queryExecution().toRdd().count() — the
steady-state regime of a production batch job, where one plan processes
many partitions and planning cost is amortized to zero. Warm-up runs
(JIT/codegen/Arrow paths/python-worker fork) discarded; median of 5.

Usage: python tools/bench_scaling.py            # levels 8, 32 -> BENCH.md
       HORUS_SCALE_LEVELS=4,8,16,32 python tools/bench_scaling.py
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("HORUS_SCALE_DOCS", "100000"))
CORPUS = f"/tmp/horus_bench_corpus_{N_DOCS}"
LEVELS = [int(x) for x in os.environ.get("HORUS_SCALE_LEVELS", "8,32").split(",")]
WARMUPS = 3
RUNS = 5


def _level_child(cores: int) -> None:
    """Runs inside a fresh subprocess: one parallelism level."""
    import time

    from horus_spark.pipeline import run_extraction
    from horus_spark.session import get_spark

    spark = get_spark(
        app_name=f"horus_scaling_{cores}",
        master=f"local[{cores}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # the corpus is only ~100-200MB of parquet: without smaller
            # split targets the scan packs into a handful of tasks and
            # serializes the shuffle-write stage (meaningless at real
            # scale, decisive for a local bench)
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "16384",
            # partitioning is explicit (repartition by doc_id); AQE only
            # adds per-stage re-planning latency here
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(CORPUS, "documents"))
    words = spark.read.parquet(os.path.join(CORPUS, "ocr_words"))

    df = run_extraction(docs, words)
    jrdd = df._jdf.queryExecution().toRdd()  # plan once; re-execute below
    for _ in range(WARMUPS):
        jrdd.count()
    times, n = [], 0
    for _ in range(RUNS):
        t0 = time.perf_counter()
        n = jrdd.count()
        times.append(time.perf_counter() - t0)
    spark.stop()
    med = statistics.median(times)
    print(
        "LEVEL_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "docs": n,
                "times_sec": [round(t, 2) for t in times],
                "median_sec": round(med, 2),
                "docs_per_sec": round(n / med, 1),
            }
        )
    )


def _materialize() -> None:
    if os.path.exists(os.path.join(CORPUS, "documents", "_SUCCESS")) and os.path.exists(
        os.path.join(CORPUS, "ocr_words", "_SUCCESS")
    ):
        return
    from horus_spark.fixtures.generator import corpus_spark
    from horus_spark.session import get_spark

    spark = get_spark(app_name="horus_scaling_gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    c = corpus_spark(spark, N_DOCS, partitions=32)
    c["documents"].write.mode("overwrite").parquet(os.path.join(CORPUS, "documents"))
    c["ocr_words"].write.mode("overwrite").parquet(os.path.join(CORPUS, "ocr_words"))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        _level_child(int(sys.argv[2]))
        return
    _materialize()
    results = []
    for cores in LEVELS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--level", str(cores)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("LEVEL_RESULT ")]
        if not line:
            sys.stderr.write(proc.stdout + proc.stderr)
            raise SystemExit(f"level {cores} failed")
        results.append(json.loads(line[-1][len("LEVEL_RESULT "):]))
    lo, hi = results[0], results[-1]
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    efficiency = speedup / (hi["cores"] / lo["cores"])
    out = {
        "metric": "extraction docs/sec at two parallelism levels",
        "levels": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "n_docs": N_DOCS,
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH.md"), "w") as fh:
        fh.write(
            "# BENCH — extraction throughput & scaling\n\n"
            "North-rule scaling evidence (sandbox proxy for N vs 4N executors:\n"
            f"`local[{lo['cores']}]` vs `local[{hi['cores']}]`, same seeded "
            f"{N_DOCS}-doc corpus read from\nparquet; each level in a fresh "
            "JVM; plan built once and re-executed (steady-state\nregime — "
            "planning amortizes to zero over a production-size input); "
            f"{WARMUPS} warm-ups\ndiscarded; median of {RUNS}):\n\n"
            "| cores | median sec | docs/sec | runs (sec) |\n|---|---|---|---|\n"
            + "".join(
                f"| {r['cores']} | {r['median_sec']} | {r['docs_per_sec']} | {r['times_sec']} |\n"
                for r in results
            )
            + f"\nSpeedup {lo['cores']}->{hi['cores']} cores: **{out['speedup']}x** "
            f"(ideal {hi['cores'] // lo['cores']}x) => scaling efficiency "
            f"**{out['scaling_efficiency']}** (target >= 0.8 per BASELINE.json "
            "north_rule).\n\n"
            f"Corpus: {N_DOCS} synthetic interleaved documents (3 layout "
            "formats, skewed 1..17-line\nitems, wrapped descriptions, HTML "
            "boilerplate on ~40% of docs), generated by\n"
            "`horus_spark.fixtures.generator` with seed 42.\n\n"
            "Pipeline under test: `horus_spark.pipeline.run_extraction` — the\n"
            "full L1-L6 + shred path (layout clustering, grid inference, field\n"
            "extraction in one Arrow-batched mapInPandas over doc_id-hash\n"
            "partitions; shred + span classification in whole-stage-codegen\n"
            "expressions).\n\n"
            f"Raw JSON: `{json.dumps(out)}`\n"
        )


if __name__ == "__main__":
    main()
