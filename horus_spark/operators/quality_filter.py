"""Gopher-style composed quality-filter verdict (Rae et al. 2021,
arXiv:2112.11446 Appendix A.1.1 "quality filtering"): the standard
rule battery web-scale pipelines apply before any model-based scoring,
composed into a single keep/reject verdict with per-rule flags so a
curation run can report WHY each document was dropped (the q13/q45/q57
signals feed tiering; this operator is the hard gate).

Rules (each a named boolean column, `keep` = their conjunction):
- r_word_count:   min_words <= n_words <= max_words
- r_mean_wlen:    3 <= mean word length <= 10
- r_symbol:       fraction of words containing '#' or ellipsis <= 0.1
- r_bullet:       fraction of lines starting with a bullet <= 0.9
- r_ellipsis:     fraction of lines ending with ellipsis <= 0.3
- r_alpha:        fraction of words with >= 1 alphabetic char >= 0.8
- r_stopwords:    >= 2 distinct common stopwords present

Everything is whole-stage-codegen expressions over one projection —
zero shuffle, zero Python; at 100 TB this is a map-side filter that
fuses into the scan. Ratios divide exact long counts, so the
rule booleans are bit-identical across engines (oracle-checked).

Reference parity: the reference admits blobs by content type only
(JobMonitor.cs:71-93); this is the text-corpus analog of that admission
gate, extended per the LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
) -> DataFrame:
    """Per doc: signals + rule booleans + keep verdict (schema above).
    Empty/whitespace docs fail r_word_count and keep a row."""
    t = F.trim(F.col(text_col))
    words = F.when(F.length(t) > 0, F.split(t, r"\s+")).otherwise(
        F.expr("array()")
    )
    lines = F.split(F.col(text_col), r"\n")
    sized = docs.select(
        F.col(id_col).alias("id"),
        words.alias("w"),
        lines.alias("ln"),
        F.lower(t).alias("lt"),
    ).select(
        "id",
        F.size("w").cast("long").alias("n_words"),
        F.aggregate(
            F.transform("w", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_wlen"),
        F.size(F.filter("w", lambda x: x.rlike("[#…]") | x.contains("..."))).cast(
            "long"
        ).alias("n_symbol_words"),
        F.size(F.filter("w", lambda x: x.rlike("[a-zA-Z]"))).cast("long").alias(
            "n_alpha_words"
        ),
        F.size(
            F.filter("ln", lambda x: F.trim(x).rlike("^[-*•]"))
        ).cast("long").alias("n_bullet_lines"),
        F.size(
            F.filter("ln", lambda x: F.trim(x).rlike("(\\.\\.\\.|…)$"))
        ).cast("long").alias("n_ellipsis_lines"),
        F.size("ln").cast("long").alias("n_lines"),
        F.size(
            F.array_intersect(
                F.array_distinct(F.split(F.col("lt"), r"\s+")),
                F.array(*[F.lit(s) for s in STOPWORDS]),
            )
        ).cast("long").alias("n_stopwords"),
    )
    nz = lambda num, den: F.when(F.col(den) > 0, F.col(num) / F.col(den)).otherwise(
        F.lit(0.0)
    )
    flagged = sized.select(
        "id",
        "n_words",
        F.round(nz("sum_wlen", "n_words"), 6).alias("mean_wlen"),
        F.round(nz("n_symbol_words", "n_words"), 6).alias("symbol_ratio"),
        F.round(nz("n_bullet_lines", "n_lines"), 6).alias("bullet_ratio"),
        F.round(nz("n_ellipsis_lines", "n_lines"), 6).alias("ellipsis_ratio"),
        F.round(nz("n_alpha_words", "n_words"), 6).alias("alpha_ratio"),
        "n_stopwords",
        (
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        ).alias("r_word_count"),
        (
            (F.col("n_words") > 0)
            & (nz("sum_wlen", "n_words") >= 3.0)
            & (nz("sum_wlen", "n_words") <= 10.0)
        ).alias("r_mean_wlen"),
        (nz("n_symbol_words", "n_words") <= 0.1).alias("r_symbol"),
        (nz("n_bullet_lines", "n_lines") <= 0.9).alias("r_bullet"),
        (nz("n_ellipsis_lines", "n_lines") <= 0.3).alias("r_ellipsis"),
        ((F.col("n_words") > 0) & (nz("n_alpha_words", "n_words") >= 0.8)).alias(
            "r_alpha"
        ),
        (F.col("n_stopwords") >= 2).alias("r_stopwords"),
    )
    rules = [
        "r_word_count",
        "r_mean_wlen",
        "r_symbol",
        "r_bullet",
        "r_ellipsis",
        "r_alpha",
        "r_stopwords",
    ]
    keep = F.lit(True)
    for r in rules:
        keep = keep & F.col(r)
    return flagged.select(
        F.col("id").alias(id_col),
        "n_words",
        "mean_wlen",
        "symbol_ratio",
        "bullet_ratio",
        "ellipsis_ratio",
        "alpha_ratio",
        "n_stopwords",
        *rules,
        keep.alias("keep"),
    )
