"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909): learn the first `n_merges` byte-pair merges from a
corpus, exactly, with the iterative argmax/merge loop expressed as
DataFrame rounds.

Why an engine needs this: every LLM data pipeline ends at a tokenizer,
and the tokenizer itself is TRAINED on the corpus the pipeline curates.
The classic implementation is a single-process counter over a word
frequency dict; at 100 TB the word-frequency table alone is a
distributed dataset. This module runs the textbook algorithm on the
cluster with the textbook's exact semantics:

- The corpus collapses ONCE to the distinct-word frequency table
  (`groupBy(word).count()` — the only corpus-scale shuffle). Every
  merge round after that touches vocabulary-sized data only, exactly
  like the reference algorithm's word-frequency dict.
- Per round: adjacent symbol pairs are exploded from each word's
  current segmentation and counted weighted by word frequency (one
  vocab-sized shuffle with map-side combine); the argmax pair (count
  desc, then lexicographic (left, right) asc — a total, deterministic
  order) is a 1-row TakeOrdered broadcast back onto the vocab.
- The merge itself is the GREEDY LEFT-TO-RIGHT single-pass rewrite
  (the semantics of the reference implementation's re-scan): a
  zero-shuffle `F.aggregate` fold per word carrying (emitted syms,
  carry) — overlapping occurrences of a self-pair like (a,a) on
  "aaaa" merge at offsets 0 and 2, never 1.
- Pair counts are exact longs; ties are broken by symbol order, so the
  learned merge table is bit-identical across partitionings and
  engines — the DuckDB oracle replays every round (argmax in SQL, the
  greedy fold as a per-word recursive-CTE walk) and hash-matches.

End-of-word handling follows the paper: each word gets a terminal
`eow` marker symbol, so merges distinguish suffix position ("w</w>")
from in-word occurrence — set eow="" to disable.

`bpe_segment` applies a learned merge table back to text in rank
order (the same fold, one pass per merge), returning each word's final
segmentation — the train/apply pair is round-trip tested in pytest
against a pure-Python reference implementation.

Scale shape: n_merges rounds x one vocab-sized pair-count Exchange;
corpus rows are touched once. State lineage is truncated per round via
localCheckpoint(eager=False) (swap for reliable checkpointing on a
real cluster), the same pattern as graph.pagerank / kmeans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_fold(syms: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right single-pass merge of adjacent (left, right)
    into left||right over a symbol array. Zero shuffle; the (out, carry)
    fold reproduces the reference re-scan exactly (self-pairs merge at
    even run offsets). Empty-string carry is the 'none' sentinel —
    symbols are never empty (chars of \\s+-split words)."""
    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("carry"),
        ),
        lambda acc, s: F.when(
            acc["carry"] == "", F.struct(acc["out"].alias("out"), s.alias("carry"))
        )
        .when(
            (acc["carry"] == left) & (s == right),
            F.struct(
                F.concat(acc["out"], F.array(F.concat(left, right))).alias("out"),
                F.lit("").alias("carry"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                s.alias("carry"),
            )
        ),
        lambda acc: F.when(acc["carry"] == "", acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        ),
    )


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt): the one corpus-scale pass — \\s+ split, empty
    tokens dropped, exact counts with map-side combine."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_state(vocab: DataFrame, eow: str) -> DataFrame:
    syms = F.regexp_extract_all("word", F.lit(r"(?s)."), 0)
    if eow:
        syms = F.concat(syms, F.array(F.lit(eow)))
    return vocab.select("word", "cnt", syms.alias("syms"))


def bpe_train(
    docs: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
    eow: str = "</w>",
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Learn the first n_merges BPE merges. Returns the merge table
    (merge_rank starting at 1, left, right, pair_count) in learned
    order. Deterministic: counts are exact longs; the argmax breaks
    ties by (left, right) ascending."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    state = _initial_state(word_frequencies(docs, text_col), eow)
    if use_local_checkpoint:
        # the corpus-scale word count materializes once; rounds reuse it
        state = state.localCheckpoint(eager=False)
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = state.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("l"),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("r"),
                )
            ).alias("p"),
        ).select(
            F.col("p.l").alias("left"),
            F.col("p.r").alias("right"),
            F.col("cnt"),
        )
        best = (
            pairs.groupBy("left", "right")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .withColumn("merge_rank", F.lit(rank))
        )
        merges.append(
            best.select("merge_rank", "left", "right", "pair_count")
        )
        # one broadcast row onto the vocab; the fold is map-side only
        state = state.crossJoin(F.broadcast(best)).select(
            "word",
            "cnt",
            _merge_fold(
                F.col("syms"), F.col("left"), F.col("right")
            ).alias("syms"),
        )
        if use_local_checkpoint:
            state = state.localCheckpoint(eager=False)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def bpe_segment(
    docs: DataFrame,
    merge_rows: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    eow: str = "</w>",
) -> DataFrame:
    """Apply a learned merge table (rows with .left/.right in rank
    order — e.g. `bpe_train(...).collect()`, a bounded n_merges-row
    collect) to a corpus: (id, word, pos, tokens array) per word, the
    fold run once per merge in rank order. The merge table is a driver
    constant, so this is a pure map-side projection over corpus rows —
    zero shuffle."""
    words = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.col(text_col)), r"\s+"),
                lambda w: w != "",
            )
        ).alias("pos", "word"),
    )
    syms = F.regexp_extract_all("word", F.lit(r"(?s)."), 0)
    if eow:
        syms = F.concat(syms, F.array(F.lit(eow)))
    for m in merge_rows:
        syms = _merge_fold(syms, F.lit(m["left"]), F.lit(m["right"]))
    return words.select("id", "word", "pos", syms.alias("tokens"))
