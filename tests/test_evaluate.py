"""token_overlap_eval: per-doc token-multiset precision/recall/F1
(operators/evaluate.py)."""

from horus_spark.operators.evaluate import token_overlap_eval


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_token_overlap_hand_math(spark):
    pred = _mk(spark, [("d1", "a a b c")])
    gold = _mk(spark, [("d1", "a b b d")])
    r = token_overlap_eval(pred, gold).collect()[0]
    # multiset: min(2,1) for 'a' + min(1,2) for 'b' = 2 common
    assert (r["n_pred"], r["n_gold"], r["n_common"]) == (4, 4, 2)
    assert (r["precision_milli"], r["recall_milli"], r["f1_milli"]) == (
        500, 500, 500,
    )


def test_token_overlap_multi_row_pred_and_perfect_match(spark):
    # block-level predictions aggregate per doc
    pred = _mk(spark, [("d1", "alpha beta"), ("d1", "gamma"), ("d2", "x y")])
    gold = _mk(spark, [("d1", "alpha beta gamma"), ("d2", "x y")])
    got = {r["doc_id"]: r for r in token_overlap_eval(pred, gold).collect()}
    for d in ("d1", "d2"):
        assert got[d]["precision_milli"] == 1000
        assert got[d]["recall_milli"] == 1000
        assert got[d]["f1_milli"] == 1000


def test_token_overlap_one_sided_docs(spark):
    pred = _mk(spark, [("only_pred", "a b")])
    gold = _mk(spark, [("only_gold", "c d e")])
    got = {r["doc_id"]: r for r in token_overlap_eval(pred, gold).collect()}
    assert got["only_pred"]["n_gold"] == 0
    assert got["only_pred"]["recall_milli"] == 0
    # f1 = 2000*0 // (2+0) = 0
    assert got["only_pred"]["f1_milli"] == 0
    assert got["only_gold"]["n_pred"] == 0
    assert got["only_gold"]["precision_milli"] == 0


def test_token_overlap_empty_text_doc_kept(spark):
    pred = _mk(spark, [("d1", "")])
    gold = _mk(spark, [("d1", "  ")])
    r = token_overlap_eval(pred, gold).collect()
    assert len(r) == 1
    assert (r[0]["n_pred"], r[0]["n_gold"], r[0]["f1_milli"]) == (0, 0, 0)


def test_token_overlap_integer_rounding(spark):
    # 1 common of 3 pred, 2 gold: p=333, r=500, f1=2000//5=400
    pred = _mk(spark, [("d1", "a x y")])
    gold = _mk(spark, [("d1", "a b")])
    r = token_overlap_eval(pred, gold).collect()[0]
    assert (r["precision_milli"], r["recall_milli"], r["f1_milli"]) == (
        333, 500, 400,
    )
