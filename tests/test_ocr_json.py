"""S6: Spark-side OCR JSON parsing must reproduce the driver-side fixture
loader exactly on all 5 reference golden fixtures, and feed the layout
engine unchanged."""

import json

import pandas as pd

from horus_spark.fixtures.reference_fixtures import (
    FIXTURE_IDS,
    QUICKSTART,
    ocr_words_pdf,
)
from horus_spark.sources.ocr_json import ocr_words_from_json


def _blob_df(spark):
    rows = []
    for fid in FIXTURE_IDS:
        with open(f"{QUICKSTART}/{fid}.pdf.ocr.json") as fh:
            rows.append((f"abc-{fid}.pdf", fh.read()))
    return spark.createDataFrame(rows, "doc_id string, ocr_json string")


def test_spark_json_parse_matches_fixture_loader(spark):
    got = (
        ocr_words_from_json(_blob_df(spark))
        .toPandas()
        .sort_values(["doc_id", "page", "line_id", "word_id"], ignore_index=True)
    )
    exp = pd.concat(
        [ocr_words_pdf(fid) for fid in FIXTURE_IDS], ignore_index=True
    ).sort_values(["doc_id", "page", "line_id", "word_id"], ignore_index=True)
    assert len(got) == len(exp) and len(got) > 900
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()
    assert got["line_id"].tolist() == exp["line_id"].tolist()
    assert got["word_id"].tolist() == exp["word_id"].tolist()
    for g, e in zip(got["bbox"], exp["bbox"]):
        assert [round(float(x), 4) for x in g] == [round(float(x), 4) for x in e]
    for g, e in zip(got["confidence"], exp["confidence"]):
        assert abs(float(g) - float(e)) < 1e-6


def test_json_source_feeds_layout_engine(spark):
    """The L1 clustering result over the Spark-parsed words matches the
    fixture's own line text for fixture 1 (the fixture-exact layout tests
    cover the rest; this proves the JSON path wires in cleanly)."""
    from horus_spark.operators.layout import cluster_lines
    from horus_spark.fixtures.reference_fixtures import expected_lines

    words = ocr_words_from_json(_blob_df(spark))
    pdf = words.filter(words.doc_id == "abc-INVOICE-30001.pdf").toPandas()
    pdf["x0"] = [min(b[0], b[6]) for b in pdf["bbox"]]
    pdf["y0"] = [min(b[1], b[3]) for b in pdf["bbox"]]
    pdf["x1"] = [max(b[2], b[4]) for b in pdf["bbox"]]
    pdf["y1"] = [max(b[5], b[7]) for b in pdf["bbox"]]
    clustered = cluster_lines(pdf)
    exp = expected_lines("INVOICE-30001")
    got_lines = (
        clustered.sort_values(["line_id", "word_id"])
        .groupby("line_id")["text"]
        .agg(" ".join)
        .tolist()
    )
    assert got_lines == [l["text"] for l in exp]


def test_ocr_parse_errors_surface_bad_blobs(spark):
    """Review finding: a malformed blob silently produced zero ocr_words
    rows and no diagnostic. The companion error channel must surface
    null and unparseable/mismatched blobs; good blobs stay out."""
    import json as _json

    from horus_spark.sources.ocr_json import ocr_parse_errors, ocr_words_from_json

    good = _json.dumps(
        {
            "analyzeResult": {
                "readResults": [
                    {
                        "page": 1, "angle": 0.0, "width": 8.5, "height": 11.0,
                        "unit": "inch",
                        "lines": [
                            {
                                "text": "hi", "boundingBox": [0, 0, 1, 0, 1, 1, 0, 1],
                                "words": [
                                    {"text": "hi",
                                     "boundingBox": [0, 0, 1, 0, 1, 1, 0, 1],
                                     "confidence": 0.99}
                                ],
                            }
                        ],
                    }
                ]
            }
        }
    )
    blobs = spark.createDataFrame(
        [
            ("ok", good),
            ("nul", None),
            ("garbage", "{not json at all"),
            ("mismatch", _json.dumps({"somethingElse": 1})),
        ],
        "doc_id string, ocr_json string",
    )
    words = ocr_words_from_json(blobs)
    assert {r["doc_id"] for r in words.collect()} == {"ok"}
    errs = {r["doc_id"]: r["error"] for r in ocr_parse_errors(blobs).collect()}
    assert errs == {
        "nul": "OCR_BLOB_NULL",
        "garbage": "OCR_JSON_UNPARSEABLE",
        "mismatch": "OCR_JSON_UNPARSEABLE",
    }
