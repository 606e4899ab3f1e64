"""Cross-page template (boilerplate) detection over a crawled domain.

Per-page screens (text density, link density — `html.html_blocks`,
`html.dom_extract`) cannot catch boilerplate that LOOKS like content on
every page: copyright lines, taglines, cookie banners, repeated
disclaimers. At web scale the signal that does catch them is
frequency: a block whose exact text appears on most of a domain's pages
is template chrome no matter how content-like it reads (the CCNet /
boilerpipe "duplicated paragraph" insight applied at domain scope).

`template_digests` computes, per (domain, md5(block_text)), the number
of distinct pages carrying the block, and flags digests present on at
least `min_pages` pages AND at least `min_frac_ppm` parts-per-million
of the domain's pages (integer arithmetic — no float thresholds).
`flag_templates` joins the verdict back onto the block frame;
`clean_pages` reassembles per-doc main text from the surviving blocks
in document order.

Scale shape: digests are map-side projections; the frequency
aggregation shuffles only slim (domain, digest, doc_id) triples with
map-side combine; the per-domain page count is a tiny second agg; the
template table that joins back is domain-repeated blocks only —
dimension-sized next to the corpus, so AQE broadcasts it. The per-doc
reassembly in `clean_pages` is one shuffle keyed by doc with a
sort_array over (block_pos, text) structs — no window, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def template_digests(
    blocks: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    text_col: str = "block_text",
    min_pages: int = 2,
    min_frac_ppm: int = 600_000,
) -> DataFrame:
    """(domain, digest, block_text, n_pages, n_domain_pages) for every
    block judged template. A block is a template when it appears on
    >= min_pages distinct pages of its domain and on >= min_frac_ppm
    ppm of the domain's pages."""
    if not (0 < min_frac_ppm <= 1_000_000):
        raise ValueError(
            f"min_frac_ppm must be in (0, 1000000], got {min_frac_ppm}"
        )
    if min_pages < 2:
        raise ValueError(f"min_pages must be >= 2, got {min_pages}")
    slim = blocks.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("digest"),
        F.col(text_col).alias("block_text"),
    )
    freq = slim.groupBy("domain", "digest").agg(
        F.countDistinct("doc_id").alias("n_pages"),
        F.min("block_text").alias("block_text"),
    )
    pages = (
        slim.select("domain", "doc_id")
        .distinct()
        .groupBy("domain")
        .agg(F.count("*").alias("n_domain_pages"))
    )
    joined = freq.join(pages, "domain")
    return joined.where(
        (F.col("n_pages") >= min_pages)
        & (
            F.col("n_pages") * F.lit(1_000_000)
            >= F.lit(min_frac_ppm) * F.col("n_domain_pages")
        )
    ).select("domain", "digest", "block_text", "n_pages", "n_domain_pages")


def flag_templates(
    blocks: DataFrame,
    templates: DataFrame,
    domain_col: str = "domain",
    text_col: str = "block_text",
) -> DataFrame:
    """Adds `is_template` (int 0/1) to the block frame by (domain,
    digest) lookup. The templates side is tiny — AQE broadcasts the
    join; no corpus-side payload beyond the digest crosses it."""
    t = templates.select(
        F.col("domain").alias("_t_domain"),
        F.col("digest").alias("_t_digest"),
        F.lit(1).alias("is_template"),
    )
    b = blocks.withColumn("_digest", F.md5(F.col(text_col)))
    out = b.join(
        t,
        (b[domain_col] == t["_t_domain"]) & (b["_digest"] == t["_t_digest"]),
        "left",
    )
    return out.select(
        *[F.col(c) for c in blocks.columns],
        F.coalesce(F.col("is_template"), F.lit(0)).alias("is_template"),
    )


def clean_pages(
    blocks: DataFrame,
    templates: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    text_col: str = "block_text",
    pos_col: str = "block_pos",
) -> DataFrame:
    """Per-doc main text after template removal: (doc_id, domain,
    n_content_blocks, n_template_blocks, clean_text) with surviving
    blocks newline-joined in document order."""
    flagged = flag_templates(blocks, templates, domain_col, text_col)
    kept = F.when(
        F.col("is_template") == 0,
        F.struct(
            F.col(pos_col).alias("pos"), F.col(text_col).alias("text")
        ),
    )
    agg = flagged.groupBy(F.col(id_col), F.col(domain_col)).agg(
        F.count("*").alias("n_content_blocks"),
        F.sum("is_template").cast("int").alias("n_template_blocks"),
        F.sort_array(F.collect_list(kept)).alias("_kept"),
    )
    return agg.select(
        id_col,
        domain_col,
        "n_content_blocks",
        "n_template_blocks",
        F.concat_ws(
            "\n", F.transform(F.col("_kept"), lambda s: s["text"])
        ).alias("clean_text"),
    )
