"""Winnowing fingerprints + SCD2 gaps-and-islands history (q86/q87)."""

import datetime
import hashlib

import pytest


def _grams_py(tokens, k=3, salt=""):
    return [
        int(
            hashlib.md5((" ".join(tokens[i : i + k]) + salt).encode())
            .hexdigest()[:15],
            16,
        )
        for i in range(len(tokens) - k + 1)
    ]


def _winnow_py(tokens, k=3, w=4, salt=""):
    g = _grams_py(tokens, k, salt)
    if not g:
        return set()
    wl = min(w, len(g))
    return {min(g[j : j + wl]) for j in range(len(g) - wl + 1)}


def test_winnow_fingerprints_python_replay(spark):
    from horus_spark.operators.winnow import winnow_fingerprints

    docs = {
        "d1": "the quick brown fox jumps over the lazy dog today",
        "d2": "one two three",  # exactly k tokens -> single gram
        "d3": "ab cd",  # fewer than k tokens -> no rows
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    got = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    assert got.get("d1") == _winnow_py(docs["d1"].split())
    assert got.get("d2") == _winnow_py(docs["d2"].split())
    assert "d3" not in got


def test_winnow_guarantee_shared_passage(spark):
    # Theorem 1 (Schleimer et al.): any shared run of >= w+k-1 tokens
    # yields at least one identical selected fingerprint in both docs.
    from horus_spark.operators.winnow import winnow_candidate_pairs

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    df = spark.createDataFrame(
        [
            ("a", f"unique opening words then {shared} and a tail"),
            ("b", f"totally different head {shared} different ending here"),
            ("c", "no overlap with anything else at all whatsoever"),
        ],
        "doc_id string, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_candidate_pairs(df, k=3, w=4, min_shared=1).collect()
    }
    assert ("a", "b") in pairs and pairs[("a", "b")] >= 1
    assert not any("c" in p for p in pairs)


def test_winnow_df_cap_drops_boilerplate_print(spark):
    # A passage present in EVERY doc is boilerplate: with max_df below
    # the corpus size its fingerprints must not generate pairs.
    from horus_spark.operators.winnow import winnow_candidate_pairs

    # Six IDENTICAL documents: every selected fingerprint has df=6, so a
    # cap of 5 drops them all (no pairs) while df<=50 keeps all C(6,2).
    # (Identical texts, not merely a shared suffix: windows straddling a
    # shared/unique boundary can select partially-shared prints with
    # df < corpus size, which correctly survive the cap.)
    boiler = "all rights reserved contact us for details and more details"
    rows = [(f"d{i}", boiler) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    with_cap = winnow_candidate_pairs(df, min_shared=1, max_df=5).collect()
    no_cap = winnow_candidate_pairs(df, min_shared=1, max_df=50).collect()
    assert with_cap == []  # every print has df=6 > 5
    assert len(no_cap) == 15  # all C(6,2) pairs share every print


def test_winnow_guards(spark):
    from horus_spark.operators.winnow import winnow_candidate_pairs, winnow_fingerprints

    df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_candidate_pairs(df, min_shared=0)
    with pytest.raises(ValueError):
        winnow_candidate_pairs(df, max_df=1)


def _d(s):
    return datetime.date.fromisoformat(s)


def test_scd2_hand_fixture(spark):
    from horus_spark.operators.scd import scd2_history

    rows = [
        # key k1: A A B A  -> three runs (A recurs after B = new row)
        ("k1", _d("2024-01-01"), "A", 1),
        ("k1", _d("2024-01-05"), "A", 2),
        ("k1", _d("2024-02-01"), "B", 3),
        ("k1", _d("2024-03-01"), "A", 4),
        # key k2: single observation
        ("k2", _d("2024-01-10"), "X", 5),
    ]
    df = spark.createDataFrame(rows, "k string, ts date, st string, id long")
    got = sorted(
        scd2_history(df, ["k"], "ts", "st", "id").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    as_tuples = [
        (r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"], r["n_observations"])
        for r in got
    ]
    assert as_tuples == [
        ("k1", "A", _d("2024-01-01"), _d("2024-02-01"), False, 2),
        ("k1", "B", _d("2024-02-01"), _d("2024-03-01"), False, 1),
        ("k1", "A", _d("2024-03-01"), None, True, 1),
        ("k2", "X", _d("2024-01-10"), None, True, 1),
    ]


def test_scd2_null_states_and_ties(spark):
    from horus_spark.operators.scd import scd2_history

    rows = [
        # NULL -> NULL repeat must NOT open a new run (null-safe compare);
        # same-ts ties resolved by the tiebreak column (id 2 before 3).
        ("k", _d("2024-01-01"), None, 1),
        ("k", _d("2024-01-02"), None, 2),
        ("k", _d("2024-01-02"), "Z", 3),
    ]
    df = spark.createDataFrame(rows, "k string, ts date, st string, id long")
    got = sorted(
        scd2_history(df, ["k"], "ts", "st", "id").collect(),
        key=lambda r: (r["valid_from"], r["n_observations"], str(r["state"])),
    )
    assert len(got) == 2
    null_run = next(r for r in got if r["state"] is None)
    z_run = next(r for r in got if r["state"] == "Z")
    assert null_run["n_observations"] == 2
    assert null_run["valid_to"] == _d("2024-01-02") and not null_run["is_current"]
    assert z_run["is_current"] and z_run["valid_to"] is None


def test_scd2_partitioning_invariance(spark):
    from horus_spark.operators.scd import scd2_history

    rows = [
        (f"k{i % 7}", _d("2024-01-01") + datetime.timedelta(days=j), ["A", "B", "C"][(i + j) % 3], i * 100 + j)
        for i in range(20)
        for j in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, ts date, st string, id long")
    one = sorted(map(tuple, scd2_history(df.coalesce(1), ["k"], "ts", "st", "id").collect()))
    many = sorted(map(tuple, scd2_history(df.repartition(16), ["k"], "ts", "st", "id").collect()))
    assert one == many
