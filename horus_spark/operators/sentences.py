"""Sentence segmentation: deterministic boundary heuristic + stats.

The unit between the document and the token: quality filters (Gopher's
mean-words-per-sentence band), chunkers that must not cut mid-sentence,
and citation/quote mining all consume sentence rows. Real NLP sentence
splitters are model-based; a corpus engine needs a DETERMINISTIC,
engine-portable rule so the same corpus always yields the same rows.

The rule (conservative English-typography heuristic, the same family
as spaCy's rule-based sentencizer / NLTK's regex fallback):

    boundary  =  a terminator run [.!?]+   (ellipses and '?!' collapse
                 into one boundary)
              +  whitespace
              +  an upper-case letter or digit opening the next
                 sentence.

What it deliberately does NOT split — the classic false boundaries:

    - abbreviations followed by a lowercase continuation
      ("i.e. more", "e.g. this"): next char fails [A-Z0-9];
    - decimals and version numbers ("3.14", "v1.2"): no whitespace
      after the dot;
    - terminators at end-of-text: nothing follows, the tail is the
      last sentence.

Abbreviations followed by a capitalized word ("Dr. Smith") DO split —
documented lossiness of any lexicon-free rule; the corpus-level stats
this feeds are insensitive to it, and a lexicon tier can be composed
upstream by protecting known abbreviations before the split.

Scale shape: one regex split + posexplode — pure map-side codegen,
ZERO shuffle (`split_sentences`); `sentence_stats` adds one per-doc
fold over the array, still zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java regex (Spark side): zero-width context so terminators stay with
# their sentence and the capital stays with the next one.
_BOUNDARY_RE = r"(?<=[.!?])\s+(?=[A-Z0-9])"


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents -> one row per sentence: (id, sent_pos, sentence),
    document order preserved. Empty/NULL texts yield no rows; the
    sentence keeps its terminator, boundary whitespace is consumed."""
    sents = F.split(F.trim(F.col(text_col)), _BOUNDARY_RE)
    out = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(sents).alias("sent_pos", "sentence"),
    )
    return out.where(F.length("sentence") > 0).select(
        "id", F.col("sent_pos").cast("int").alias("sent_pos"), "sentence"
    )


def sentence_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document sentence-shape stats, computed as ONE map-side
    array fold (no explode, no shuffle): (id, n_sentences,
    mean_sent_chars_ppm, max_sent_chars, mean_sent_words_ppm). The
    Gopher-style quality bands read these directly; ppm values are
    exact integer divisions so every engine agrees."""
    sents = F.filter(
        F.split(F.trim(F.col(text_col)), _BOUNDARY_RE),
        lambda s: F.length(s) > 0,
    )
    n = F.size(sents)
    chars = F.aggregate(
        sents, F.lit(0).cast("long"), lambda a, s: a + F.length(s)
    )
    words = F.aggregate(
        sents,
        F.lit(0).cast("long"),
        lambda a, s: a + F.size(F.split(s, r"\s+")),
    )
    staged = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(n, F.lit(0)).cast("int").alias("n_sentences"),
        F.coalesce(chars, F.lit(0)).cast("long").alias("_chars"),
        F.coalesce(words, F.lit(0)).cast("long").alias("_words"),
        F.coalesce(
            F.aggregate(
                sents, F.lit(0), lambda a, s: F.greatest(a, F.length(s))
            ),
            F.lit(0),
        ).alias("max_sent_chars"),
    )
    # exact integer floor division: every engine agrees bit-for-bit
    mean = "CAST({c} * CAST(1000000 AS BIGINT) div n_sentences AS BIGINT)"
    return staged.select(
        "id",
        "n_sentences",
        F.when(
            F.col("n_sentences") > 0, F.expr(mean.format(c="_chars"))
        ).alias("mean_sent_chars_ppm"),
        "max_sent_chars",
        F.when(
            F.col("n_sentences") > 0, F.expr(mean.format(c="_words"))
        ).alias("mean_sent_words_ppm"),
    )


def readability(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease scoring in EXACT integer arithmetic — the
    classic prose-complexity prior (quality filters band on it next to
    the Gopher rules):

        flesch = 206.835 - 1.015 * words/sentence
                         - 84.6  * syllables/word

    restated in integer micro/milli units so every engine agrees
    bit-for-bit (the q130/q151 convention — no float division anywhere;
    both inner divisions run on non-negative operands so floor/trunc
    semantics cannot diverge):

        wps_ppm      = n_words  * 1e6 div n_sentences
        spw_ppm      = n_syllables * 1e6 div n_words
        flesch_milli = 206835 - (1015 * wps_ppm)  div 1e6
                              - (84600 * spw_ppm) div 1e6

    Sentences come from the same boundary rule as `split_sentences`;
    syllables use the standard lexicon-free heuristic max(1, vowel
    groups [aeiouy]+) per lowercased word. Returns (id, n_words,
    n_sentences, n_syllables, flesch_milli); empty/NULL texts score
    NULL with zero counts. ZERO shuffle — one map-side projection of
    array folds."""
    sents = F.filter(
        F.split(F.trim(F.col(text_col)), _BOUNDARY_RE),
        lambda s: F.length(s) > 0,
    )
    from horus_spark.operators.textstats import ws_tokens_expr

    words = ws_tokens_expr(F.col(text_col))
    syll = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda a, w: a
        + F.greatest(F.lit(1), F.regexp_count(F.lower(w), F.lit("[aeiouy]+"))),
    )
    staged = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.size(words), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.size(sents), F.lit(0)).cast("long").alias("n_sentences"),
        F.coalesce(syll, F.lit(0)).cast("long").alias("n_syllables"),
    )
    return staged.select(
        "id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            (F.col("n_words") > 0) & (F.col("n_sentences") > 0),
            F.expr(
                "CAST(206835"
                " - (1015 * (n_words * CAST(1000000 AS BIGINT)"
                "            div n_sentences)) div 1000000"
                " - (84600 * (n_syllables * CAST(1000000 AS BIGINT)"
                "             div n_words)) div 1000000 AS BIGINT)"
            ),
        ).alias("flesch_milli"),
    )


def sentence_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 20,
) -> DataFrame:
    """Sentence-boundary windowing — the standard retrieval/RAG
    chunker: pack CONSECUTIVE sentences greedily into windows of at
    most `budget` whitespace tokens, never splitting a sentence
    (chunking.py cuts mid-sentence at fixed strides; this respects the
    author's boundaries, the q99 segment_spans convention at sentence
    granularity). A sentence longer than the budget gets its own
    window — spans are never split, budgets are best-effort for
    oversized units.

    Returns (id, window_id, n_sentences, n_tokens, window_text) with
    window_id in document order. Scale shape: the boundary split, the
    per-sentence token costs and the greedy next-fit fold are ALL
    per-document array expressions — pure map-side codegen, ZERO
    shuffle; only the final window rows explode. The q172 oracle
    replays the next-fit as a recursive CTE (the q92/q99 house
    pattern), so the fold is pinned bit-exactly."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    sents = F.filter(
        F.split(F.trim(F.col(text_col)), _BOUNDARY_RE),
        lambda s: F.length(s) > 0,
    )
    staged = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            sents,
            lambda s: F.struct(
                s.alias("s"),
                F.size(F.split(s, r"\s+")).cast("long").alias("c"),
            ),
        ).alias("_sc"),
    )
    folded = F.expr(
        f"""
        aggregate(
          _sc,
          cast(array() as
               array<struct<ntok: bigint, nsent: int, text: string>>),
          (acc, x) -> case
            when size(acc) > 0
                 and element_at(acc, -1).ntok + x.c <= {budget} then
              concat(
                slice(acc, 1, size(acc) - 1),
                array(named_struct(
                  'ntok', element_at(acc, -1).ntok + x.c,
                  'nsent', element_at(acc, -1).nsent + 1,
                  'text', concat(element_at(acc, -1).text, ' ', x.s))))
            else concat(acc, array(named_struct(
              'ntok', x.c, 'nsent', 1, 'text', x.s)))
          end)
        """
    )
    wins = staged.select("id", folded.alias("_w")).select(
        "id", F.posexplode("_w").alias("window_id", "w")
    )
    return wins.select(
        "id",
        F.col("window_id").cast("int").alias("window_id"),
        F.col("w.nsent").alias("n_sentences"),
        F.col("w.ntok").alias("n_tokens"),
        F.col("w.text").alias("window_text"),
    )
