"""Line-break text repair for extracted documents.

PDF and OCR text extraction (the layout.py tier) emits text LINE BY
LINE, and print typography hyphenates words across line breaks
("exam-\\nple"). Feeding that to a tokenizer splits one word into two
garbage tokens, so every serious extraction pipeline runs a
de-hyphenation pass (pdftotext's -raw repair, Grobid's
"dehyphenization", Tesseract post-processing). `dehyphenate` is that
pass as a zero-shuffle Spark expression.

Rule (the conservative standard): a line that ends with
<letter>-<end> is joined with the next line iff the next line starts
with a LOWERCASE letter — "Well-\\nBeing GmbH" keeps its hyphen (next
line starts uppercase: likely a true compound or a name), while
"exam-\\nple" joins to "example". Unjoined lines are joined with a
single space (the reading-order concatenation the rest of the pipeline
expects).

Scale shape: one `F.aggregate` fold per document over its line array —
pure whole-stage-codegen expressions, zero shuffle, no Python. The
fold carries (text so far, join count); `n_joins` is the repair-rate
signal (a corpus whose n_joins explodes was scanned at the wrong DPI
or split mid-word by a bad segmenter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dehyphenate_expr(lines: Column) -> Column:
    """struct(text_repaired, n_joins) from an array<string> of lines.
    Empty/NULL lines are dropped before the fold (a NULL element would
    poison the running concat)."""
    clean = F.filter(
        lines, lambda ln: ln.isNotNull() & (F.trim(ln) != "")
    )
    folded = F.aggregate(
        clean,
        F.struct(
            F.lit("").alias("text"), F.lit(0).cast("int").alias("n")
        ),
        lambda acc, ln: F.when(
            acc["text"] == "", F.struct(F.trim(ln).alias("text"), acc["n"].alias("n"))
        )
        .when(
            acc["text"].rlike("[A-Za-z]-$") & F.trim(ln).rlike("^[a-z]"),
            F.struct(
                F.concat(
                    acc["text"].substr(
                        F.lit(1), F.length(acc["text"]) - 1
                    ),
                    F.trim(ln),
                ).alias("text"),
                (acc["n"] + 1).alias("n"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["text"], F.lit(" "), F.trim(ln)).alias("text"),
                acc["n"].alias("n"),
            )
        ),
    )
    return F.struct(
        folded["text"].alias("text_repaired"),
        folded["n"].alias("n_joins"),
    )


def dehyphenate(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, text_repaired, n_joins) per document from an
    array<string> line column — the de-hyphenation join rule applied
    left-to-right in reading order. Zero shuffle."""
    out = dehyphenate_expr(F.col(lines_col))
    return df.select(
        F.col(id_col),
        out["text_repaired"].alias("text_repaired"),
        out["n_joins"].alias("n_joins"),
    )


# --- mojibake (double-encoding) detection + repair -------------------

# A UTF-8 byte sequence misread as ISO-8859-1 turns every multi-byte
# codepoint into a lead char in U+00C2-U+00F4 followed by 1-3 chars in
# U+0080-U+00BF (the continuation-byte range) - the classic "A-tilde
# garbage" web-corpus artifact. Genuine Latin text never places a
# continuation-range char (C1 controls, NBSP-to-upside-down-question
# punctuation) right after an accented capital, so lead+continuation
# PAIRS are the standard detection heuristic (same signal ftfy keys
# on). Escaped \uXXXX forms keep raw C1 control bytes out of source.
_MOJIBAKE_RE = "[\\u00C2-\\u00F4][\\u0080-\\u00BF]"


def fix_mojibake_expr(text: Column) -> Column:
    """struct(text_fixed, was_mojibake, n_fixed) repairing UTF-8-read-
    as-Latin-1 double encoding: re-encode the string as ISO-8859-1 and
    decode the bytes as UTF-8 - the exact inverse of the corruption.

    Three guards make the repair conservative (never corrupts clean
    text, mojibake or not):
      1. the lead+continuation pair pattern must appear (clean "hallo
         with umlauts" has accents followed by ASCII letters - no
         match, untouched);
      2. no codepoint may exceed U+00FF (one proves the string is NOT
         a misread Latin-1 buffer, and Spark 4's strict encode would
         RAISE on it rather than substitute);
      3. the re-encoded bytes must be valid UTF-8 (is_valid_utf8) -
         Spark 4's decode also raises on malformed input instead of
         inserting U+FFFD, so validity is checked before, not after.
    The strict encode/decode sit under nested CASE WHEN conditions
    (guards 1+2 first, then 3), so they only ever run on rows already
    proven safe - CaseWhen codegen evaluates branches per row, unlike
    a flat AND chain whose conjuncts Catalyst may reorder.

    n_fixed counts collapsed chars (length delta): each repaired
    2-byte codepoint shrinks the string by 1, a 3-byte one by 2 - the
    corpus-health signal (a spike means an upstream reader regressed
    to the wrong charset). Zero shuffle, zero Python."""
    s = F.coalesce(text, F.lit(""))
    lat = F.encode(s, "ISO-8859-1")
    pre = s.rlike(_MOJIBAKE_RE) & ~s.rlike("[^\\u0000-\\u00FF]")
    fire = F.when(pre, F.is_valid_utf8(lat)).otherwise(F.lit(False))
    fixed = F.when(fire, F.decode(lat, "UTF-8")).otherwise(s)
    return F.struct(
        fixed.alias("text_fixed"),
        fire.alias("was_mojibake"),
        F.when(fire, F.length(s) - F.length(fixed))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_fixed"),
    )


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, text_fixed, was_mojibake, n_fixed) per document -
    conservative double-encoding repair over a text column. Zero
    shuffle; pure whole-stage-codegen expressions."""
    out = fix_mojibake_expr(F.col(text_col))
    return df.select(
        F.col(id_col),
        out["text_fixed"].alias("text_fixed"),
        out["was_mojibake"].alias("was_mojibake"),
        out["n_fixed"].alias("n_fixed"),
    )
