"""Interleaved-span structure operators: modality-sequence analytics and
image-caption pair mining over the north-rule span shape
(spans: array<struct<kind,text,media_ref,offset>>).

Interleaved text+media documents are the input contract of this engine
(reference: nikkh/Horus processes scanned-form documents whose pages mix
text runs with embedded media; see Models/Document.cs for the per-page
word/line structure). A multimodal training-data pipeline needs two
things the plain-text operators cannot give:

- STRUCTURE analytics over the interleaving itself (how media-dense is a
  document, how fragmented is its text, how often does the modality
  alternate) — the signals used to route documents to text-only vs
  multimodal training mixes;
- CAPTION mining: (media_ref, nearby text) pairs in document order — the
  LAION / MMC4-style construction of image-text training pairs from
  interleaved web documents.

Scale notes: every operator here is a pure map-side array expression
(array_sort comparator + transform/filter/aggregate lambdas are JVM
expressions, not Python) — ZERO shuffles, zero UDFs; output inherits the
scan's partitioning, so at 10^12 documents these are scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _by_offset(col: Column) -> Column:
    """Sort a spans array by its offset field (array_sort's default struct
    ordering would compare `kind` first, which is wrong)."""
    return F.array_sort(
        col,
        lambda l, r: (
            F.when(l["offset"] < r["offset"], F.lit(-1))
            .when(l["offset"] > r["offset"], F.lit(1))
            .otherwise(F.lit(0))
        ),
    )


def _tok_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank (split('') is [''])."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def interleave_stats(
    spans_df: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Per-document modality-structure stats over an interleaved spans
    array: span/text/media counts, modality transitions (adjacent pairs
    whose text-vs-media category differs, in offset order), the longest
    run of consecutive text spans, and total text characters.

    Single map-side pass per document: one array_sort + three aggregate
    folds — no shuffle, no Python. Documents with an empty spans array
    get an all-zeros row (they are still documents; dropping them would
    silently shrink downstream joins)."""
    arr = _by_offset(F.col(spans_col))
    is_text = lambda s: s["kind"] == F.lit("text")  # noqa: E731

    # modality transitions: fold carrying (prev category, count)
    trans = F.aggregate(
        arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"), F.lit(0).alias("n")
        ),
        lambda acc, s: F.struct(
            F.when(is_text(s), F.lit("T")).otherwise(F.lit("M")).alias("prev"),
            (
                acc["n"]
                + F.when(
                    acc["prev"].isNotNull()
                    & (
                        acc["prev"]
                        != F.when(is_text(s), F.lit("T")).otherwise(F.lit("M"))
                    ),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n"),
        ),
        lambda acc: acc["n"],
    )

    # longest consecutive-text run: fold carrying (current run, best run)
    max_run = F.aggregate(
        arr,
        F.struct(F.lit(0).alias("cur"), F.lit(0).alias("best")),
        lambda acc, s: F.struct(
            F.when(is_text(s), acc["cur"] + 1).otherwise(F.lit(0)).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(is_text(s), acc["cur"] + 1).otherwise(F.lit(0)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )

    text_chars = F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(is_text(s), F.length(s["text"]).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )

    return spans_df.select(
        F.col(id_col),
        F.size(arr).alias("n_spans"),
        F.size(F.filter(arr, is_text)).alias("n_text"),
        F.size(F.filter(arr, lambda s: ~is_text(s))).alias("n_media"),
        trans.alias("n_transitions"),
        max_run.alias("max_text_run"),
        text_chars.alias("text_chars"),
    )


def caption_pairs(
    spans_df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    min_tokens: int = 1,
    max_tokens: int = 256,
) -> DataFrame:
    """Mine (media_ref, caption) training pairs from interleaved spans:
    for every media span, the caption candidate is the IMMEDIATELY
    PRECEDING span if it is text, else the immediately following span if
    it is text, else the media span yields no pair (adjacency in offset
    order — the MMC4/LAION heuristic that alt-text-adjacent prose is the
    best caption source). Candidates are then filtered to
    [min_tokens, max_tokens] whitespace tokens.

    Selection happens BEFORE the length filter: a media span whose
    preceding text span is too short yields no pair (it does not fall
    through to the following span) — the adjacency rule picks the
    candidate, the bounds judge it.

    Pure map-side array expressions (get/transform/filter lambdas) —
    zero shuffle, zero Python. Output: (id, media_ref, media_kind,
    caption, cap_src in {'before','after'}, n_cap_tokens)."""
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    if max_tokens < min_tokens:
        raise ValueError(
            f"max_tokens={max_tokens} < min_tokens={min_tokens}"
        )
    arr = _by_offset(F.col(spans_col))
    # one slot per array position carrying (self, prev, next); F.get is
    # total (NULL out of range), so edges need no special cases
    idx = F.when(F.size(arr) > 0, F.sequence(F.lit(0), F.size(arr) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    slots = F.transform(
        idx,
        lambda i: F.struct(
            F.get(arr, i).alias("s"),
            F.get(arr, i - 1).alias("p"),
            F.get(arr, i + 1).alias("n"),
        ),
    )
    media = F.filter(slots, lambda c: c["s"]["kind"] != F.lit("text"))
    cands = F.transform(
        media,
        lambda c: F.struct(
            c["s"]["media_ref"].alias("media_ref"),
            c["s"]["kind"].alias("media_kind"),
            # NULL-struct field access is NULL, so a missing neighbour
            # simply fails both whens -> NULL caption -> filtered below
            F.when(c["p"]["kind"] == F.lit("text"), c["p"]["text"])
            .when(c["n"]["kind"] == F.lit("text"), c["n"]["text"])
            .alias("caption"),
            F.when(c["p"]["kind"] == F.lit("text"), F.lit("before"))
            .when(c["n"]["kind"] == F.lit("text"), F.lit("after"))
            .alias("cap_src"),
        ),
    )
    out = spans_df.select(
        F.col(id_col), F.explode(cands).alias("c")
    ).select(
        id_col,
        F.col("c.media_ref").alias("media_ref"),
        F.col("c.media_kind").alias("media_kind"),
        F.col("c.caption").alias("caption"),
        F.col("c.cap_src").alias("cap_src"),
        _tok_count(F.col("c.caption")).alias("n_cap_tokens"),
    )
    return out.filter(
        F.col("caption").isNotNull()
        & (F.col("n_cap_tokens") >= min_tokens)
        & (F.col("n_cap_tokens") <= max_tokens)
    )
