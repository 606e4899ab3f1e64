"""Gazetteer phrase matching: find every occurrence of a dictionary of
multi-word phrases in a document corpus (dictionary-based entity
tagging — the classic curation primitive behind blocklist screening,
brand/product mention mining, and weak-supervision NER labeling).

Spark-first shape, designed for a tiny-dim x huge-fact asymmetry (a
gazetteer is thousands-to-millions of phrases; the corpus is the 100 TB
side):

- The dictionary is BROADCAST. Corpus rows never shuffle: each document
  generates its token n-grams (one array expression per distinct phrase
  length) map-side, explodes them, and the broadcast hash join filters
  them immediately. The only Exchange in the whole plan is whatever the
  caller aggregates afterwards.
- N-grams are generated ONLY for lengths that actually occur in the
  dictionary (collected driver-side from the dim — a bounded action on
  the small side, same pattern as similarity.py's centroid collect).
  A dictionary of {2,3}-word phrases costs ~2 gram rows per token, not
  max_len rows.
- Matching is whitespace-token exact (optionally lowercased), so a
  phrase can never match across a token boundary ("scan me" does not
  match inside "scans мере") — same tokenizer as textstats
  (tokens_expr), so token positions line up with token_count_expr
  counts and invindex.py postings.
- ALL occurrences are reported, including overlaps ("a b" and "b c"
  both match in "a b c") — gazetteer semantics; callers wanting
  leftmost-longest can window over (doc_id, start, -length).

Reference parity note: the reference engine's form-field anchoring scans
each recognized line for per-format literal key phrases
(Horus.Functions/Models/*.cs anchor tables, cf. operators/fields.py);
this operator is the corpus-scale generalization: one pass, any
dictionary, positions out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr


def _norm_phrase(col, lowercase: bool):
    c = F.trim(F.regexp_replace(col, r"\s+", " "))
    return F.lower(c) if lowercase else c


def gazetteer_match(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
    label_col: str | None = "label",
    lowercase: bool = True,
) -> DataFrame:
    """All occurrences of `phrases[phrase_col]` in `docs[text_col]`.

    Returns (doc_id, phrase, label?, start, end_, n_words): `start`/
    `end_` are 1-based token positions (inclusive), `phrase` is the
    dictionary's original (un-normalized) string. Empty/blank phrases
    are dropped; duplicate normalized phrases are collapsed to one row
    per (normalized, label) so a sloppy dictionary cannot double-count
    matches.
    """
    dim = phrases.select(
        F.col(phrase_col).alias("_orig"),
        _norm_phrase(F.col(phrase_col), lowercase).alias("_gram"),
        *([F.col(label_col).alias("label")] if label_col else []),
    ).filter(F.col("_gram") != "")
    dim = dim.withColumn(
        "_nw", F.size(F.split(F.col("_gram"), " "))
    ).dropDuplicates(["_gram"] + (["label"] if label_col else []))

    # distinct phrase lengths: a bounded action on the SMALL side only
    lengths = sorted(
        r["_nw"] for r in dim.select("_nw").distinct().collect()
    )
    if not lengths:
        raise ValueError("gazetteer dictionary is empty after normalization")

    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(
        tokens_expr(F.lower(text) if lowercase else text),
        lambda x: x != "",
    )
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    tcol = F.col("_toks")

    def grams_of(n: int):
        # one struct (start, n, gram) per window position; empty array
        # when the doc is shorter than the phrase
        return F.when(
            F.size(tcol) >= n,
            F.transform(
                F.slice(tcol, 1, F.size(tcol) - (n - 1)),
                lambda _x, i: F.struct(
                    (i + 1).alias("start"),
                    F.lit(n).alias("_nw"),
                    F.concat_ws(
                        " ", *[F.element_at(tcol, i + j + 1) for j in range(n)]
                    ).alias("_gram"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<start:int,_nw:int,_gram:string>>")
        )

    cand = d.select(
        "doc_id",
        F.explode(
            F.flatten(F.array(*[grams_of(n) for n in lengths]))
        ).alias("g"),
    ).select("doc_id", "g.start", "g._nw", "g._gram")

    out = cand.join(F.broadcast(dim), ["_gram", "_nw"]).select(
        "doc_id",
        F.col("_orig").alias("phrase"),
        *(["label"] if label_col else []),
        F.col("start").cast("int").alias("start"),
        (F.col("start") + F.col("_nw") - 1).cast("int").alias("end_"),
        F.col("_nw").cast("int").alias("n_words"),
    )
    return out


def gazetteer_counts(
    matches: DataFrame, by: tuple[str, ...] = ("phrase",)
) -> DataFrame:
    """Convenience rollup over gazetteer_match output: match count and
    distinct-document spread per key (default per phrase). One hash
    aggregate; (doc, key) pre-aggregation gives map-side combine the
    same way top_ngrams does."""
    per_doc = matches.groupBy("doc_id", *by).agg(
        F.count(F.lit(1)).alias("_c")
    )
    return per_doc.groupBy(*by).agg(
        F.sum("_c").alias("n_matches"),
        F.count(F.lit(1)).alias("n_docs"),
    )
