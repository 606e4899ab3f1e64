"""S2 admission filter (JobMonitor.cs:71-93) and S8 account-partitioned
persistence (CosmosPersistenceEngine.cs:27-50)."""

import os

from pyspark.sql import functions as F

from horus_spark.sources.admission import admit, rejected
from horus_spark.sources.sink import get_persistence_engine


def _staged(spark):
    return spark.createDataFrame(
        [
            ("d1", "application/pdf", "BlockBlob"),
            ("d2", "image/jpeg", "BlockBlob"),
            ("d3", "text/html", "BlockBlob"),
            ("d4", "application/pdf", "AppendBlob"),
            ("d5", None, "BlockBlob"),
        ],
        "doc_id string, content_type string, blob_type string",
    )


def test_admission_filter(spark):
    df = _staged(spark)
    ok = admit(df, blob_type_col="blob_type")
    assert {r.doc_id for r in ok.collect()} == {"d1", "d2"}
    bad = rejected(df, blob_type_col="blob_type")
    assert {r.doc_id for r in bad.collect()} == {"d3", "d4", "d5"}
    # the isin predicate reaches the scan as a pushable filter
    plan = ok._jdf.queryExecution().optimizedPlan().toString()
    assert "content_type" in plan


def test_account_partitioned_sink(spark, tmp_path):
    from horus_spark.fixtures.generator import corpus_spark
    from horus_spark.pipeline import run_extraction

    c = corpus_spark(spark, 10, partitions=2)
    extracted = run_extraction(c["documents"], c["ocr_words"])
    sink = get_persistence_engine("by_account")
    out = str(tmp_path / "alt")
    sink(extracted, out)
    base = os.path.join(out, "documents_by_account")
    parts = [p for p in os.listdir(base) if p.startswith("account_pk=")]
    assert len(parts) >= 2  # physically partitioned by account
    back = spark.read.parquet(base)
    assert back.count() == 10
    assert "line_items" not in back.columns  # header graph only
    # persist-time PostCode truncation applies on this sink too
    assert back.filter(F.length("post_code") > 10).count() == 0
