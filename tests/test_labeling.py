"""c-TF-IDF class labeling (operators/labeling.py)."""

import pytest

from horus_spark.operators.labeling import class_tfidf_labels


def test_distinctive_beats_frequent(spark):
    # 'the' floods every class; 'spark'/'cooking' are distinctive.
    rows = [
        ("tech", "the the the spark spark jobs the"),
        ("tech", "the spark cluster the the"),
        ("food", "the the cooking pans the cooking"),
        ("food", "the recipe cooking the the"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = class_tfidf_labels(df, "source", k=2).collect()
    top = {r["group"]: [] for r in out}
    for r in sorted(out, key=lambda r: (r["group"], r["rank"])):
        top[r["group"]].append(r["term"])
    assert top["tech"][0] == "spark"
    assert top["food"][0] == "cooking"
    # 'the' is in every class: idf_micro == round(ln(1 + 2/2)*1e6)
    assert all("the" != terms[0] for terms in top.values())


def test_min_count_prunes_hapax(spark):
    df = spark.createDataFrame(
        [("a", "unique word word word"), ("b", "other other noise noise")],
        "source string, text string",
    )
    out = class_tfidf_labels(df, "source", k=5, min_count=2).collect()
    terms = {r["term"] for r in out}
    assert "unique" not in terms  # hapax pruned


def test_deterministic_and_guard(spark):
    df = spark.createDataFrame(
        [("a", "x y z x y"), ("b", "p q r p q")],
        "source string, text string",
    )
    a = [tuple(r) for r in class_tfidf_labels(df, "source", min_count=1).collect()]
    b = [tuple(r) for r in class_tfidf_labels(df, "source", min_count=1).collect()]
    assert sorted(a) == sorted(b)
    with pytest.raises(ValueError):
        class_tfidf_labels(df, "source", k=0)
