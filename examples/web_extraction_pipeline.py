"""End-to-end WEB extraction over a crawled-HTML corpus — the north
rule's HTML path driven as one pipeline, each stage a horus_spark
operator:

    raw pages -> flat text-density block screen (html_blocks)
    -> cross-page template removal (template_digests/clean_pages)
    -> DOM-tree Readability/CETD main-content extraction (dom_extract)
    -> outlink extraction + URL resolution (extract_links)
    -> domain survey (domain_counts) -> domain PageRank (graph tier)
    -> language routing + quality scoring + exact dedup on the
       extracted main content
    -> next crawl wave: robots policy (parse_robots/apply_robots) +
       sitemap discovery (parse_sitemaps) + frontier_update

Runs locally in under a minute:

    python examples/web_extraction_pipeline.py [sf_dir]

(default sf_dir: /root/testdata/sf0.001). Page synthesis is the demo's
INPUT setup (a real deployment reads a crawled warc-derived table of
(doc_id, html, url)); every stage below it is the library API.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import horus_spark as h  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = h.get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    did = F.col("doc_id").cast("long")

    # ---- INPUT setup: deterministic crawl corpus (50 synthetic hosts,
    # two injected cross-site links per page) --------------------------
    pages = h.synthesize_html(docs)
    site = lambda e: F.concat(  # noqa: E731
        F.lit("https://site-"), e.cast("string"), F.lit(".test")
    )
    rel = F.concat(
        F.lit('<div class="rel"><p><a href="'),
        site((did * 7 + 1) % 50),
        F.lit("/doc/"),
        F.col("doc_id"),
        F.lit('">Related reading</a> <a href="'),
        site((did * 13 + 2) % 50),
        F.lit('/">Partner site</a></p></div></body></html>'),
    )
    pages = pages.select(
        "doc_id",
        F.replace(F.col("html"), F.lit("</body></html>"), rel).alias("html"),
        F.concat(site(did % 50), F.lit("/doc/"), F.col("doc_id")).alias("url"),
    ).localCheckpoint()
    n_pages = pages.count()
    print(f"[0] crawl corpus: {n_pages} pages over 50 hosts")

    # ---- 1. flat screen: cheap per-block verdicts on every page ------
    blocks = h.html_blocks(pages)
    flat = blocks.agg(
        F.count(F.lit(1)).alias("blocks"),
        F.sum("is_content").alias("content_blocks"),
        F.sum(F.when(F.col("is_content") == 1, F.col("text_chars"))).alias(
            "content_chars"
        ),
    ).first()
    print(
        f"[1] flat screen: {flat['blocks']} blocks, "
        f"{flat['content_blocks']} pass ({flat['content_chars']} chars)"
    )

    # ---- 2. DOM tier: exact main-content recovery ---------------------
    content = h.dom_extract(pages).localCheckpoint()
    stats = content.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_blocks").alias("blocks"),
        F.sum("content_chars").alias("chars"),
    ).first()
    print(
        f"[2] dom_extract: {stats['docs']} docs -> {stats['blocks']} "
        f"content blocks, {stats['chars']} chars"
    )

    # ---- 3. outlinks -> domain survey -> PageRank ---------------------
    links = h.extract_links(pages, base_url_col="url").localCheckpoint()
    n_links = links.count()
    n_ext = links.where(
        (F.col("is_internal") == 0) & F.col("dst_domain").isNotNull()
    ).count()
    survey = h.domain_counts(
        links.where(F.col("resolved").isNotNull()), url_col="resolved"
    )
    top = survey.orderBy(F.desc("n_docs")).first()
    print(
        f"[3] links: {n_links} total, {n_ext} external; "
        f"top dst domain {top['domain']} ({top['n_docs']} links)"
    )
    src_host = F.concat(
        F.lit("site-"),
        (F.col("doc_id").cast("long") % 50).cast("string"),
        F.lit(".test"),
    )
    edges = (
        links.where(F.col("dst_domain").isNotNull())
        .select(src_host.alias("src"), F.col("dst_domain").alias("dst"))
        .distinct()
    )
    ranks = h.pagerank(edges, n_iter=5)
    best = ranks.orderBy(F.desc("rank_micro")).first()
    print(
        f"[4] pagerank over {ranks.count()} domains; "
        f"top {best['node']} rank_micro={best['rank_micro']}"
    )

    # ---- 4. curation over the EXTRACTED text --------------------------
    from horus_spark.operators.textstats import langid_expr, quality_score_expr

    text = content.select("doc_id", F.col("content_text").alias("text"))
    curated = text.select(
        "doc_id",
        langid_expr(F.col("text")).alias("lang"),
        quality_score_expr(F.col("text")).alias("quality"),
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in curated.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    good = curated.where(F.col("quality") >= 0.3).count()
    dd = h.exact_dedup(text)
    kept = dd.where(~F.col("is_duplicate")).count()
    print(
        f"[5] curation on extracted text: langs={by_lang}, "
        f"{good}/{n_pages} pass quality, {kept} canonical after exact dedup"
    )

    # ---- 5. cross-page template removal on the flat tier --------------
    cb = blocks.where(F.col("is_content") == 1).withColumn(
        "domain", src_host
    )
    tmpl = h.template_digests(cb, min_pages=2, min_frac_ppm=600_000)
    cleaned = h.clean_pages(cb, tmpl)
    t = cleaned.agg(
        F.sum("n_template_blocks").alias("stripped"),
        F.count(F.lit(1)).alias("docs"),
    ).first()
    print(
        f"[6] template removal: {tmpl.count()} domain-template digests, "
        f"{t['stripped']} content-looking boilerplate blocks stripped "
        f"across {t['docs']} docs"
    )

    # ---- 6. the next crawl wave: robots + sitemaps + frontier ---------
    hosts = pages.select(
        src_host.alias("domain")
    ).distinct()
    robots = hosts.select(
        "domain",
        F.lit(
            "User-agent: *\nDisallow: /private\n\n"
            "User-agent: horusbot\nDisallow: /doc/"
        ).alias("robots_txt"),
    )
    rules = h.parse_robots(robots, agent="horusbot")
    sitemaps = hosts.select(
        F.col("domain").alias("src"),
        F.concat(
            F.lit("<urlset><url><loc>https://"),
            F.col("domain"),
            F.lit("/fresh</loc><priority>0.8</priority></url></urlset>"),
        ).alias("sitemap_xml"),
    )
    sm = h.parse_sitemaps(sitemaps)
    sitemap_links = sm.select(
        F.col("src").alias("doc_id"), F.col("loc").alias("resolved")
    )
    outlinks = links.select("doc_id", "resolved").unionByName(sitemap_links)
    frontier = h.frontier_update(
        outlinks, seen=pages.select("url"), rules=rules, per_host_budget=4
    )
    fr = frontier.agg(
        F.count(F.lit(1)).alias("urls"),
        F.countDistinct("host").alias("hosts"),
    ).first()
    assert frontier.where(F.col("url").like("%/doc/%")).count() == 0, (
        "robots Disallow: /doc/ must keep doc links out of the frontier"
    )
    print(
        f"[7] next wave: {sm.count()} sitemap entries discovered, "
        f"frontier = {fr['urls']} urls over {fr['hosts']} hosts "
        f"(robots-filtered, budget 4/host)"
    )
    print("DONE")


if __name__ == "__main__":
    main()
