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
