"""Inspector-port scoring over the extracted corpus: a perfect extraction
must earn the maximum score the reference's integer-division quirk allows
(20 header + n * floor(80/n) line points — Inspector.cs:353-367)."""

import pyspark.sql.functions as F

from horus_spark.fixtures.generator import corpus_pandas, corpus_spark
from horus_spark.operators.scoring import score_documents
from horus_spark.pipeline import run_extraction

N = 40


def test_perfect_extraction_scores_max(spark):
    c = corpus_spark(spark, N, partitions=4)
    extracted = run_extraction(c["documents"], c["ocr_words"])
    cp = corpus_pandas(N)
    exp_docs = spark.createDataFrame(cp["expected_documents"])
    exp_lines = spark.createDataFrame(cp["expected_lines"])
    scores = score_documents(extracted, exp_docs, exp_lines)
    # nouryon prints DiscountPercent as '3% / 12.50' which the shredder
    # (faithfully: PRE0005 -> 0) cannot parse, so nouryon lines with a
    # nonzero discount can score at most 5/6 — the reference engine has the
    # same failure mode on that layout.
    per_line = exp_lines.select(
        "doc_id",
        F.when(
            F.col("doc_id").startswith("nouryon") & (F.col("discount") != 0), 5
        )
        .otherwise(6)
        .alias("max_matches"),
    )
    n_lines = exp_lines.groupBy("doc_id").agg(F.count("*").alias("n"))
    expected_pts = (
        per_line.join(n_lines, "doc_id")
        .select(
            "doc_id",
            F.floor(F.floor(F.lit(80) / F.col("n")) * F.col("max_matches") / 6).alias("pts"),
        )
        .groupBy("doc_id")
        .agg(F.sum("pts").cast("int").alias("expected_line_points"))
    )
    j = scores.join(expected_pts, "doc_id")
    rows = j.collect()
    assert len(rows) == N
    for r in rows:
        assert r.header_points == 20, r
        assert r.line_points == r.expected_line_points, r


def test_score_drops_on_corruption(spark):
    c = corpus_spark(spark, 10, partitions=2)
    extracted = run_extraction(c["documents"], c["ocr_words"]).withColumn(
        "post_code", F.lit("WRONG")
    )
    cp = corpus_pandas(10)
    scores = score_documents(
        extracted,
        spark.createDataFrame(cp["expected_documents"]),
        spark.createDataFrame(cp["expected_lines"]),
    )
    assert all(r.header_points == int(20 * 6 / 7) for r in scores.collect())


def test_score_summary_and_current_previous_flip(spark, tmp_path):
    """A7: per-team rollup + the reference's CURRENT->PREVIOUS status flip
    on write (Inspector.cs:116-160)."""
    from horus_spark.operators.scoring import score_summary, write_scores_with_flip

    run1 = spark.createDataFrame(
        [("d1", "alpha", 98), ("d2", "alpha", 50), ("d3", "beta", 100)],
        "doc_id string, team string, score int",
    )
    summary = {r.team: (r.total_score, r.n_documents) for r in score_summary(run1).collect()}
    assert summary == {"alpha": (148, 2), "beta": (100, 1)}

    out = str(tmp_path / "scores")
    write_scores_with_flip(run1, out)
    cur = spark.read.parquet(out + "/status=CURRENT")
    assert cur.count() == 3
    import os

    assert not os.path.exists(out + "/status=PREVIOUS")

    run2 = spark.createDataFrame(
        [("d1", "alpha", 100)], "doc_id string, team string, score int"
    )
    write_scores_with_flip(run2, out)
    cur2 = {r.doc_id: r.score for r in spark.read.parquet(out + "/status=CURRENT").collect()}
    prev = {r.doc_id: r.score for r in spark.read.parquet(out + "/status=PREVIOUS").collect()}
    assert cur2 == {"d1": 100}
    assert prev == {"d1": 98, "d2": 50, "d3": 100}
