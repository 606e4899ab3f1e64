"""Span-corruption mask planning (operators/masking.py)."""

import hashlib

import pytest

from horus_spark.operators.masking import span_corruption_plan


def _h(doc, p):
    return int(hashlib.md5(f"{doc}:{p}".encode()).hexdigest()[:15], 16)


def _replay(doc, nt, start_rate=20, min_len=2, len_mod=3):
    raws = []
    for p in range(nt):
        hv = _h(doc, p)
        if hv % start_rate == 0:
            raws.append((p, min(p + min_len + (hv // start_rate) % len_mod, nt)))
    merged = []
    for s, e in raws:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return [(doc, i, s, e, e - s) for i, (s, e) in enumerate(merged)]


def test_python_replay_differential(spark):
    docs = [(f"doc{i}", " ".join(f"w{j}" for j in range(40 + 17 * i))) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = sorted(tuple(r) for r in span_corruption_plan(df).collect())
    exp = sorted(
        row for doc, text in docs for row in _replay(doc, len(text.split()))
    )
    assert got == exp


def test_spans_disjoint_ordered_and_clipped(spark):
    df = spark.createDataFrame(
        [(f"d{i}", " ".join(f"t{j}" for j in range(200))) for i in range(8)],
        "doc_id string, text string",
    )
    rows = span_corruption_plan(df).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    assert by_doc, "expected some spans at 200 tokens x 8 docs"
    for doc, spans in by_doc.items():
        spans.sort(key=lambda r: r["mask_id"])
        prev_end = -1
        for i, r in enumerate(spans):
            assert r["mask_id"] == i
            assert 0 <= r["span_start"] < r["span_end"] <= 200
            assert r["span_start"] > prev_end  # disjoint after merge
            assert r["n_masked"] == r["span_end"] - r["span_start"]
            prev_end = r["span_end"]


def test_corruption_rate_near_nominal(spark):
    # start_rate=20, mean len 3 -> ~15% of tokens masked (merging
    # loses a little; accept a broad deterministic band)
    df = spark.createDataFrame(
        [(f"d{i}", " ".join(f"t{j}" for j in range(500))) for i in range(20)],
        "doc_id string, text string",
    )
    rows = span_corruption_plan(df).collect()
    masked = sum(r["n_masked"] for r in rows)
    rate = masked / (500 * 20)
    assert 0.08 < rate < 0.22


def test_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [("a", ""), ("b", None), ("c", "one two three")],
        "doc_id string, text string",
    )
    rows = span_corruption_plan(df).collect()
    assert all(r["id"] == "c" for r in rows)


def test_param_validation(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        span_corruption_plan(df, start_rate=0)


def test_plan_shuffle_free(spark):
    df = spark.createDataFrame(
        [("a", "some words here")], "doc_id string, text string"
    )
    plan = (
        span_corruption_plan(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_ul2_routing_and_classes(spark):
    from horus_spark.operators.masking import ul2_denoiser_plan

    docs = [(f"doc{i}", " ".join(f"w{j}" for j in range(80))) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = ul2_denoiser_plan(df).collect()
    by_doc: dict[str, set] = {}
    for r in rows:
        by_doc.setdefault(r["id"], set()).add(r["denoiser"])
    # each doc belongs to exactly one class, matching the hash route
    for doc, classes in by_doc.items():
        hv = int(hashlib.md5(doc.encode()).hexdigest()[:15], 16) % 3
        assert classes == {"RSX"[hv]}, (doc, classes)
    # S docs: exactly one span covering the final quarter
    s_rows = [r for r in rows if r["denoiser"] == "S"]
    assert s_rows, "expected some S-class docs among 30"
    for r in s_rows:
        assert (r["mask_id"], r["span_start"], r["span_end"]) == (0, 60, 80)
        assert r["n_masked"] == 20
    # R rows match span_corruption_plan on the same slice
    r_docs = [d for d in by_doc if "R" in by_doc[d]]
    sub = df.where(df.doc_id.isin(r_docs))
    want = sorted(
        tuple(r) for r in span_corruption_plan(sub).collect()
    )
    got = sorted(
        (r["id"], r["mask_id"], r["span_start"], r["span_end"], r["n_masked"])
        for r in rows
        if r["denoiser"] == "R"
    )
    assert got == want
    # X spans are long: every span >= 8 tokens unless clipped at the end
    for r in rows:
        if r["denoiser"] == "X":
            assert r["n_masked"] >= 8 or r["span_end"] == 80
