"""C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2) — the
classic web-text scrub a training-data pipeline runs between extraction
and quality scoring: keep only lines that end in terminal punctuation,
drop lines with too few words, drop lines carrying boilerplate phrases
("javascript", "cookie", policy chrome), and drop WHOLE documents that
contain "lorem ipsum" or a curly brace (templating leftovers).

Shape at scale: the entire operator is ONE map-side projection — split
on newlines, classify each line with string expressions, rebuild the
kept text with array_join. Zero shuffles, zero Python; a 100 TB corpus
cleans at scan speed and inherits the scan's partitioning. Per-rule
removal counts come back as first-class columns so the survey step
("what did the cleaner eat?") is a plain aggregation over the same
pass, not a second job.

Rules are evaluated in a fixed precedence (junk > short > no-punct) so
each removed line is counted under exactly one rule — the counts sum
to n_lines - n_kept, which the oracle verifies.

Reference parity: the reference engine has no corpus-cleaning tier (it
shreds already-recognized forms, DocumentProcessor.cs); this extends
the LLM-data-pipeline operator set alongside textstats/quality_filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# phrases whose presence kills the LINE (case-insensitive substring)
LINE_BLOCKLIST: tuple[str, ...] = ("javascript", "cookie", "privacy policy")
# phrases whose presence anywhere kills the DOCUMENT
DOC_BLOCKLIST: tuple[str, ...] = ("lorem ipsum", "{")
# a kept line must END (after right-trim) with one of these
TERMINAL_PUNCT: tuple[str, ...] = (".", "!", "?", '"')


def _line_words(line: Column) -> Column:
    return F.when(F.length(F.trim(line)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(line), r"\s+"))
    )


def _is_junk(line: Column) -> Column:
    low = F.lower(line)
    cond = F.lit(False)
    for phrase in LINE_BLOCKLIST:
        cond = cond | low.contains(phrase)
    return cond


def _ends_terminal(line: Column) -> Column:
    last = F.substring(F.rtrim(line), -1, 1)
    return last.isin(*TERMINAL_PUNCT)


def c4_line_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
) -> DataFrame:
    """Per document: cleaned text (kept lines joined with newlines) plus
    the accounting — (id_col, n_lines, n_kept, n_junk, n_short,
    n_nopunct, doc_flagged, cleaned). `doc_flagged` marks documents the
    doc-level blocklist would drop entirely; `cleaned` is still the
    line-filtered text so callers choose drop vs quarantine.

    Line precedence: junk phrase > fewer than `min_words` words >
    missing terminal punctuation — one rule per removed line, so
    n_junk + n_short + n_nopunct == n_lines - n_kept."""
    if min_words < 1:
        raise ValueError("min_words must be >= 1")
    # NULL text folds to "" so the accounting stays sane (split(NULL)
    # yields NULL and size(NULL) = -1, which would report n_lines=-1 and
    # a NULL doc_flagged that silently drops the doc from c4_clean's
    # negated filter); "" counts as one short line and is dropped loudly.
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")

    junk = _is_junk
    short = lambda l: ~_is_junk(l) & (_line_words(l) < min_words)  # noqa: E731
    nopunct = (  # noqa: E731
        lambda l: ~_is_junk(l) & (_line_words(l) >= min_words) & ~_ends_terminal(l)
    )
    keep = (  # noqa: E731
        lambda l: ~_is_junk(l) & (_line_words(l) >= min_words) & _ends_terminal(l)
    )

    low_doc = F.lower(text)
    flagged = F.lit(False)
    for phrase in DOC_BLOCKLIST:
        flagged = flagged | low_doc.contains(phrase)

    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.filter(lines, keep)).cast("long").alias("n_kept"),
        F.size(F.filter(lines, junk)).cast("long").alias("n_junk"),
        F.size(F.filter(lines, short)).cast("long").alias("n_short"),
        F.size(F.filter(lines, nopunct)).cast("long").alias("n_nopunct"),
        flagged.alias("doc_flagged"),
        F.array_join(F.filter(lines, keep), "\n").alias("cleaned"),
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
) -> DataFrame:
    """The filter DECISION: drop doc-flagged documents and documents
    with zero surviving lines; replace text with the cleaned version.
    Returns (id_col, text) — a drop-in cleaned corpus."""
    s = c4_line_stats(docs, id_col, text_col, min_words)
    return (
        s.filter(~F.col("doc_flagged") & (F.col("n_kept") > 0))
        .select(F.col(id_col), F.col("cleaned").alias(text_col))
    )
