"""Span-corruption mask planning (T5 / UL2 denoising pretraining).

Seq2seq pretraining corrupts ~15% of tokens in spans of mean length ~3
(Raffel et al. 2020 §3.1.4); the PLAN — which token intervals each
document masks — must be a pure function of the corpus so that every
epoch, every engine and every re-run materializes the same training
examples (the same reproducibility contract as the q74 epoch shuffle).

Derivation (hash-driven, loop-free):

  - a span STARTS at token position p iff
        h(doc_id, p) % start_rate == 0
    with h = the first 60 bits of md5(doc_id || ':' || p) — at
    start_rate=20 and mean span 3 that corrupts ~15% of tokens;
  - its raw length is min_len + (h div start_rate) % len_mod
    (uniform over [min_len, min_len+len_mod), mean 3 at 2+[0,3)),
    clipped at the document end;
  - overlapping/adjacent raw spans MERGE into maximal intervals
    (interval union — so the plan never double-masks a token), and
    mask_id numbers the merged spans in document order.

Output: (id, mask_id, span_start, span_end, n_masked) with span_end
EXCLUSIVE. The q167 oracle recomputes the same hash positions in SQL
and merges via gaps-and-islands — interval union is representation-
independent, so the zero-shuffle array fold here and the window
recursion there must agree bit-for-bit.

Scale shape: candidate starts and the merge fold are per-document
ARRAY expressions (transform/filter/aggregate over the token-position
sequence) — pure map-side codegen, ZERO shuffle; only the final
explode materializes span rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.textstats import ws_tokens_expr


def span_corruption_plan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    start_rate: int = 20,
    min_len: int = 2,
    len_mod: int = 3,
) -> DataFrame:
    """Deterministic denoising-mask plan; see module docstring."""
    if start_rate < 1 or min_len < 1 or len_mod < 1:
        raise ValueError("start_rate, min_len, len_mod must be >= 1")
    toks = ws_tokens_expr(F.col(text_col))
    nt = F.size(toks)
    h = (
        "cast(conv(substring(md5(cast(concat(cast(id as string), ':',"
        " cast(p as string)) as binary)), 1, 15), 16, 10) as bigint)"
    )
    # raw candidate spans (s, e), e exclusive, clipped at nt — built as
    # one array expression over token positions
    # hash each position ONCE (lambdas get no CSE — inlining {h} into
    # both 'e' and 'hit' would md5 every token twice), then derive the
    # span fields from the carried hv
    raw = F.expr(
        f"""
        case when nt <= 0 then
          cast(array() as array<struct<s: int, e: int>>)
        else
          transform(
            filter(
              transform(sequence(0, int(nt) - 1),
                p -> named_struct('p', cast(p as int), 'hv', {h})),
              x -> x.hv % {start_rate} = 0),
            x -> named_struct(
              's', x.p,
              'e', cast(least(
                     x.p + {min_len} + (x.hv div {start_rate})
                       % {len_mod},
                     nt) as int)))
        end
        """
    )
    # interval union: fold sorted candidates into merged spans
    merged = F.expr(
        """
        aggregate(
          _raw,
          cast(array() as array<struct<s: int, e: int>>),
          (acc, x) -> case
            when size(acc) > 0 and x.s <= element_at(acc, -1).e then
              concat(
                slice(acc, 1, size(acc) - 1),
                array(named_struct(
                  's', element_at(acc, -1).s,
                  'e', greatest(element_at(acc, -1).e, x.e))))
            else concat(acc, array(named_struct('s', x.s, 'e', x.e)))
          end)
        """
    )
    staged = df.select(
        F.col(id_col).alias("id"), F.coalesce(nt, F.lit(0)).alias("nt")
    ).select("id", "nt", raw.alias("_raw"))
    spans = staged.select("id", merged.alias("_m")).select(
        "id", F.posexplode("_m").alias("mask_id", "sp")
    )
    return spans.select(
        "id",
        F.col("mask_id").cast("int").alias("mask_id"),
        F.col("sp.s").alias("span_start"),
        F.col("sp.e").alias("span_end"),
        (F.col("sp.e") - F.col("sp.s")).cast("int").alias("n_masked"),
    )


def ul2_denoiser_plan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """UL2 mixture-of-denoisers planning (Tay et al. 2022; the PaLM-2
    pretraining recipe): every document is routed to ONE denoiser
    class by hash — the mixture rides the corpus, not the trainer —
    and gets that class's deterministic mask plan:

      R (regular):    the T5 plan — start_rate 20, spans [2, 5)
                      (~15% corrupted in short spans);
      S (sequential): PrefixLM — ONE span covering the final quarter
                      of the document (max(1, nt div 4) tokens);
      X (extreme):    start_rate 10, spans [8, 16) (~long-span heavy
                      corruption).

    Routing: first 60 bits of md5(doc_id) mod 3 -> 0=R, 1=S, 2=X —
    reproducible across epochs/engines like everything else in this
    module. Returns (id, denoiser, mask_id, span_start, span_end,
    n_masked); span_end exclusive; empty docs yield no rows.

    Scale shape: two span_corruption_plan invocations on hash-disjoint
    slices plus one pure projection for S — all zero-shuffle map-side
    work; the union is a plan-level concat."""
    doc_h = (
        "cast(conv(substring(md5(cast(cast(id as string) as binary)),"
        " 1, 15), 16, 10) as bigint)"
    )
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_text")
    ).withColumn("_cls", F.expr(f"{doc_h} % 3"))
    r_plan = span_corruption_plan(
        base.filter(F.col("_cls") == 0), text_col="_text", id_col="id"
    ).select("id", F.lit("R").alias("denoiser"), "mask_id",
             "span_start", "span_end", "n_masked")
    x_plan = span_corruption_plan(
        base.filter(F.col("_cls") == 2),
        text_col="_text",
        id_col="id",
        start_rate=10,
        min_len=8,
        len_mod=8,
    ).select("id", F.lit("X").alias("denoiser"), "mask_id",
             "span_start", "span_end", "n_masked")
    nt = F.coalesce(F.size(ws_tokens_expr(F.col("_text"))), F.lit(0))
    s_plan = (
        base.filter(F.col("_cls") == 1)
        .select("id", nt.alias("nt"))
        .where(F.col("nt") > 0)
        .select(
            "id",
            F.lit("S").alias("denoiser"),
            F.lit(0).cast("int").alias("mask_id"),
            F.expr(
                "cast(nt - greatest(nt div 4, 1) as int)"
            ).alias("span_start"),
            F.col("nt").cast("int").alias("span_end"),
            F.expr("cast(greatest(nt div 4, 1) as int)").alias("n_masked"),
        )
    )
    return r_plan.unionByName(s_plan).unionByName(x_plan)
