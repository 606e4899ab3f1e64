"""WARC crawl-archive source: the ingestion front for the HTML web tier.

Web corpora arrive as WARC archives (one record per fetch: WARC headers,
then the HTTP message, blank-line separated). This source reads the
concatenated text form distributedly and parses records with pure JVM
expressions — the same no-Python-touches-the-blob rule as the OCR-JSON
source (sources/ocr_json.py):

- `read_warc` splits files on the record delimiter with
  `spark.read.text(lineSep="WARC/1.0\\r\\n")` — Hadoop's record reader
  handles delimiters straddling file-split boundaries, so a multi-GB
  archive scans fully parallel with no whole-file materialization.
- `parse_warc_records` extracts WARC headers / HTTP status / HTTP
  Content-Type / payload with anchored multiline regexes and two
  lazy blank-line splits — all whole-stage codegen, zero shuffle,
  oracle-replayable (q109).
- `html_responses` is the admission filter (the S2 analog for the web
  tier): WARC-Type response + HTTP 200 + text/html -> (url, html),
  ready for html_blocks / dom_extract / html_to_spans / extract_links.

Environment note: real Common-Crawl WARCs are gzip-per-record; this
environment has no splittable-gzip codec, so `read_warc` documents the
text form (decompress upstream or swap the reader; the parse core is
format-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_DELIM = "WARC/1.0\r\n"

# record = WARC headers \r\n\r\n HTTP headers \r\n\r\n payload
_WARC_HDRS_RE = r"(?s)^(.*?)\r?\n\r?\n"
_HTTP_HDRS_RE = r"(?s)^.*?\r?\n\r?\n(.*?)\r?\n\r?\n"
_PAYLOAD_RE = r"(?s)^.*?\r?\n\r?\n.*?\r?\n\r?\n(.*)$"


def parse_warc_records(df: DataFrame, record_col: str = "record") -> DataFrame:
    """Parse delimiter-stripped WARC records into typed columns:
    warc_type, target_uri, warc_date, http_status (int, NULL for
    non-response records), content_type (HTTP header, NULL when
    absent), payload. Pure expressions — zero shuffle, zero Python."""
    rec = F.col(record_col)
    warc_hdrs = F.regexp_extract(rec, _WARC_HDRS_RE, 1)
    http_hdrs = F.regexp_extract(rec, _HTTP_HDRS_RE, 1)
    status = F.regexp_extract(http_hdrs, r"(?m)^HTTP/[0-9.]+\s+([0-9]{3})", 1)
    ctype = F.regexp_extract(http_hdrs, r"(?im)^Content-Type:\s*([^\r\n]+)", 1)
    return df.withColumns(
        {
            "warc_type": F.regexp_extract(
                warc_hdrs, r"(?m)^WARC-Type:\s*(\S+)", 1
            ),
            "target_uri": F.regexp_extract(
                warc_hdrs, r"(?m)^WARC-Target-URI:\s*(\S+)", 1
            ),
            "warc_date": F.regexp_extract(
                warc_hdrs, r"(?m)^WARC-Date:\s*(\S+)", 1
            ),
            "http_status": F.nullif(status, F.lit("")).cast("int"),
            "content_type": F.nullif(ctype, F.lit("")),
            "payload": F.regexp_extract(rec, _PAYLOAD_RE, 1),
        }
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a (text-form) WARC archive into parsed records, one row per
    record, fully split-parallel."""
    raw = spark.read.text(path, lineSep=WARC_DELIM)
    recs = raw.where(F.length(F.trim(F.col("value"))) > 0).select(
        F.col("value").alias("record")
    )
    return parse_warc_records(recs)


def html_responses(parsed: DataFrame) -> DataFrame:
    """Admission filter for the web tier: fetched HTML documents only,
    as (url, html) — feed to html_blocks / dom_extract / html_to_spans /
    extract_links."""
    return parsed.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    ).select(
        F.col("target_uri").alias("url"), F.col("payload").alias("html")
    )
