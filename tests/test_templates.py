"""Cross-page template detection (operators/templates.py, oracle q112)."""

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.templates import (
    clean_pages,
    flag_templates,
    template_digests,
)

COPY = "Copyright 2026 Example Corp all rights reserved"
PAIR = "Subscribe to our newsletter today"


@pytest.fixture(scope="module")
def blocks(spark):
    # domain a.test: 3 pages; COPY on all 3, PAIR on 2 (66% >= 60%),
    # unique content per page. domain b.test: 1 page carrying COPY —
    # below min_pages there, and frequency is domain-scoped.
    rows = [
        ("a.test", "d1", 0, "unique content for page one here"),
        ("a.test", "d1", 1, COPY),
        ("a.test", "d1", 2, PAIR),
        ("a.test", "d2", 0, "second page says something else entirely"),
        ("a.test", "d2", 1, COPY),
        ("a.test", "d2", 2, PAIR),
        ("a.test", "d3", 0, "third page own words and nothing shared"),
        ("a.test", "d3", 1, COPY),
        ("b.test", "d4", 0, COPY),
        ("b.test", "d4", 1, "b domain real content stands alone"),
    ]
    return spark.createDataFrame(
        rows, "domain string, doc_id string, block_pos int, block_text string"
    )


def test_template_digests_domain_scoped(blocks):
    t = template_digests(blocks, min_pages=2, min_frac_ppm=600_000)
    got = {(r.domain, r.block_text): (r.n_pages, r.n_domain_pages)
           for r in t.collect()}
    # COPY: 3/3 pages of a.test; PAIR: 2/3 (666666 ppm >= 600000).
    # Nothing from b.test (COPY is on 1 page there; min_pages=2).
    assert got == {("a.test", COPY): (3, 3), ("a.test", PAIR): (2, 3)}


def test_flag_and_clean(blocks):
    t = template_digests(blocks, min_pages=2, min_frac_ppm=600_000)
    flagged = flag_templates(blocks, t)
    n_tmpl = {
        r.doc_id: r.n
        for r in flagged.groupBy("doc_id")
        .agg(F.sum("is_template").alias("n"))
        .collect()
    }
    assert n_tmpl == {"d1": 2, "d2": 2, "d3": 1, "d4": 0}

    clean = {r.doc_id: r for r in clean_pages(blocks, t).collect()}
    assert clean["d1"].clean_text == "unique content for page one here"
    assert clean["d1"].n_content_blocks == 3
    assert clean["d1"].n_template_blocks == 2
    # b.test keeps COPY (not a template THERE), in document order
    assert clean["d4"].clean_text == (
        COPY + "\nb domain real content stands alone"
    )
    assert clean["d4"].n_template_blocks == 0


def test_all_template_page_empty_text(spark):
    rows = [
        ("a.test", "d1", 0, COPY),
        ("a.test", "d2", 0, COPY),
    ]
    b = spark.createDataFrame(
        rows, "domain string, doc_id string, block_pos int, block_text string"
    )
    t = template_digests(b, min_pages=2, min_frac_ppm=600_000)
    clean = {r.doc_id: r for r in clean_pages(b, t).collect()}
    assert clean["d1"].clean_text == ""
    assert clean["d1"].n_template_blocks == 1


def test_param_guards(blocks):
    with pytest.raises(ValueError):
        template_digests(blocks, min_pages=1)
    with pytest.raises(ValueError):
        template_digests(blocks, min_frac_ppm=0)
    with pytest.raises(ValueError):
        template_digests(blocks, min_frac_ppm=2_000_000)
