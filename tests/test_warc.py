"""WARC source: distributed record split + pure-expression parse
(sources/warc.py)."""

import os

from pyspark.sql import functions as F

from horus_spark.sources.warc import (
    WARC_DELIM,
    html_responses,
    parse_warc_records,
    read_warc,
)

REC_RESPONSE = (
    "WARC-Type: response\r\n"
    "WARC-Target-URI: https://example.com/a\r\n"
    "WARC-Date: 2026-08-19T00:00:00Z\r\n"
    "Content-Length: 34\r\n"
    "\r\n"
    "HTTP/1.1 200 OK\r\n"
    "Content-Type: text/html; charset=utf-8\r\n"
    "\r\n"
    "<html><body><p>hello</p></body></html>"
)
REC_REQUEST = (
    "WARC-Type: request\r\n"
    "WARC-Target-URI: https://example.com/a\r\n"
    "WARC-Date: 2026-08-19T00:00:00Z\r\n"
    "\r\n"
    "GET /a HTTP/1.1\r\n"
    "Host: example.com\r\n"
    "\r\n"
)
REC_404 = (
    "WARC-Type: response\r\n"
    "WARC-Target-URI: https://example.com/missing\r\n"
    "WARC-Date: 2026-08-19T00:00:01Z\r\n"
    "\r\n"
    "HTTP/1.1 404 Not Found\r\n"
    "Content-Type: text/html\r\n"
    "\r\n"
    "<html>gone</html>"
)


def test_parse_warc_records(spark):
    df = spark.createDataFrame(
        [(REC_RESPONSE,), (REC_REQUEST,), (REC_404,)], "record string"
    )
    rows = {
        (r["warc_type"], r["target_uri"]): r
        for r in parse_warc_records(df).collect()
    }
    ok = rows[("response", "https://example.com/a")]
    assert ok["http_status"] == 200
    assert ok["content_type"] == "text/html; charset=utf-8"
    assert ok["payload"] == "<html><body><p>hello</p></body></html>"
    assert ok["warc_date"] == "2026-08-19T00:00:00Z"
    req = rows[("request", "https://example.com/a")]
    assert req["http_status"] is None  # GET line is not a status line
    assert req["content_type"] is None
    assert req["payload"] == ""
    nf = rows[("response", "https://example.com/missing")]
    assert nf["http_status"] == 404


def test_parse_shuffle_free(spark):
    df = spark.createDataFrame([(REC_RESPONSE,)], "record string")
    plan = (
        parse_warc_records(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_read_warc_file_and_admission(spark, tmp_path):
    # archive text form: delimiter before every record
    archive = "".join(
        WARC_DELIM + rec for rec in (REC_RESPONSE, REC_REQUEST, REC_404)
    )
    p = os.path.join(str(tmp_path), "crawl.warc")
    with open(p, "w", newline="") as f:
        f.write(archive)
    parsed = read_warc(spark, p)
    assert parsed.count() == 3
    pages = html_responses(parsed).collect()
    # admission: response + 200 + text/html only
    assert len(pages) == 1
    assert pages[0]["url"] == "https://example.com/a"
    assert pages[0]["html"].startswith("<html><body>")


def test_read_warc_feeds_html_tier(spark, tmp_path):
    from horus_spark.operators.html import dom_extract

    p = os.path.join(str(tmp_path), "one.warc")
    with open(p, "w", newline="") as f:
        f.write(WARC_DELIM + REC_RESPONSE)
    pages = html_responses(read_warc(spark, p)).withColumnRenamed(
        "url", "doc_id"
    )
    got = dom_extract(pages).collect()[0]
    assert got["content_text"] == "hello"
