"""Sequence packing: bin documents into fixed token-budget training
sequences.

LLM pre-training consumes fixed-length sequences (2k/4k/8k tokens);
feeding one short document per sequence wastes most of the context
window, so pipelines PACK multiple documents per sequence. Exact optimal
packing is bin-packing (NP-hard) and any streaming packer is inherently
sequential — a global greedy pass cannot be distributed as-is.

The standard at-scale resolution (used here): SHARD the corpus
deterministically, pack each shard independently with a sequential
greedy NEXT-FIT pass, in a deterministic document order. Properties:

- embarrassingly parallel: shards never interact; one task per shard;
- bounded waste: next-fit within a shard wastes at most one partial
  sequence tail per shard — with shards of thousands of documents the
  overhead is noise (and identical to what a per-worker streaming
  packer produces in practice);
- deterministic and engine-portable: shard = md5-derived, order =
  document id — the same corpus packs identically on every run
  (the q41 oracle replays the exact algorithm as a recursive CTE);
- shuffle-light: only (shard, id, n_tokens) crosses the exchange — the
  packer never sees document payloads; assignments join back to text
  by id afterwards. At 100 TB of text the packing shuffle is a few GB.

Choose n_shards so a shard's (id, n_tokens) pairs fit one task
comfortably (millions of docs per shard is fine — the applyInPandas
group is two slim columns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark.operators.sampling import md5_long


def shard_expr(key, n_shards: int, salt: str = ""):
    """Deterministic shard id in [0, n_shards): md5-derived, portable
    across engines (sampling.md5_long construction)."""
    return (md5_long(key, salt) % n_shards).cast("int")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Assign every document to a (shard, seq_id, seq_pos) training-
    sequence slot via per-shard greedy next-fit in ascending id order.

    Next-fit: documents are taken in order; when the running token total
    would exceed `budget`, the current sequence closes and a new one
    starts. A single document larger than `budget` gets its own
    sequence (callers wanting truncation should clip `tokens_col`
    upstream). Output: (id_col, shard, seq_id, seq_pos, tokens_col) —
    join back to payloads by id.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    slim = df.select(
        shard_expr(F.col(id_col), n_shards, salt).alias("shard"),
        F.col(id_col).alias("_id"),
        F.col(tokens_col).cast("long").alias("_tokens"),
    )
    id_type = slim.schema["_id"].dataType.simpleString()
    out_schema = (
        f"shard int, _id {id_type}, seq_id int, seq_pos int, _tokens long"
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id", kind="mergesort").reset_index(drop=True)
        if pdf["_tokens"].isna().any():
            # a NULL count arrives as NaN, and NaN poisons the running
            # total silently (run + t > budget is False forever after) —
            # the whole remaining shard would pack into one unbounded
            # sequence; fail loudly instead
            bad = pdf.loc[pdf["_tokens"].isna(), "_id"].iloc[0]
            raise ValueError(f"null {tokens_col} for id {bad!r}")
        toks = pdf["_tokens"].to_numpy()
        seq_ids = np.empty(len(toks), dtype=np.int32)
        seq_pos = np.empty(len(toks), dtype=np.int32)
        seq, pos, run = 0, 0, 0
        for i, t in enumerate(toks):
            if pos > 0 and run + t > budget:
                seq += 1
                pos = 0
                run = 0
            seq_ids[i] = seq
            seq_pos[i] = pos
            run += t
            pos += 1
        pdf["seq_id"] = seq_ids
        pdf["seq_pos"] = seq_pos
        return pdf[["shard", "_id", "seq_id", "seq_pos", "_tokens"]]

    packed = slim.groupBy("shard").applyInPandas(pack_shard, schema=out_schema)
    return packed.select(
        F.col("_id").alias(id_col),
        "shard",
        "seq_id",
        "seq_pos",
        F.col("_tokens").alias(tokens_col),
    )


def packing_stats(packed: DataFrame, tokens_col: str, budget: int) -> DataFrame:
    """Per-shard packing efficiency: sequences produced, mean fill ratio,
    and token waste — the monitoring aggregate a packing job emits."""
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum(tokens_col).alias("seq_tokens")
    )
    return per_seq.groupBy("shard").agg(
        F.count("*").alias("n_sequences"),
        F.round(F.avg(F.least(F.col("seq_tokens"), F.lit(budget)) / budget), 4).alias(
            "mean_fill"
        ),
        F.sum(
            F.greatest(F.lit(budget) - F.col("seq_tokens"), F.lit(0))
        ).alias("wasted_tokens"),
    )
