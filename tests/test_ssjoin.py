"""prefix_jaccard_pairs: exact all-pairs set-similarity join via prefix
filtering — brute-force parity, exact threshold boundaries, and the
no-recall-hole guarantee that distinguishes it from the df-capped
inverted index (jaccard_pairs)."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.dedup import jaccard_pairs
from horus_spark.operators.ssjoin import prefix_jaccard_pairs, token_sets


def _brute_pairs(rows, threshold_ppm):
    """Reference all-pairs over whitespace token SETS, exact integer ppm."""
    sets = {i: set(t.split()) for i, t in rows if t is not None and t.split()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * 1_000_000 >= threshold_ppm * union:
            out[(a, b)] = (inter, union, inter * 1_000_000 // union)
    return out


def _collect(df):
    return {
        (r.id_a, r.id_b): (r.inter, r.union_, r.jaccard_ppm)
        for r in df.collect()
    }


def test_brute_force_parity_random_corpus(spark):
    """40 docs over a 30-word vocab (forced overlap), three thresholds —
    operator output must equal the brute-force reference EXACTLY."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (f"d{i:02d}", " ".join(rng.choices(vocab, k=rng.randint(3, 18))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for t in (300_000, 600_000, 900_000):
        got = _collect(prefix_jaccard_pairs(df, threshold_ppm=t))
        assert got == _brute_pairs(rows, t), f"mismatch at t={t}"


def test_threshold_boundary_is_exact(spark):
    """J == t must be INCLUDED (>=, decided in exact integers): {a,b,c}
    vs {b,c,d} has J = 2/4 = 0.5 exactly; {a,b,c} vs {c,d,e} (J=0.2)
    must not appear at t=0.5."""
    df = spark.createDataFrame(
        [("x", "a b c"), ("y", "b c d"), ("z", "c d e")],
        "doc_id string, text string",
    )
    got = _collect(prefix_jaccard_pairs(df, threshold_ppm=500_000))
    assert ("x", "y") in got and got[("x", "y")] == (2, 4, 500_000)
    assert ("x", "z") not in got
    # y vs z: inter {c,d} = 2, union 4 -> exactly 0.5, also included
    assert got[("y", "z")] == (2, 4, 500_000)


def test_no_recall_hole_under_mass_duplication(spark):
    """The df-capped inverted index (jaccard_pairs, max_doc_freq=8)
    provably finds NOTHING in a 30-clone cluster (every shared shingle
    is hot); the prefix filter has no frequency cap and must find every
    pair: C(30,2) clone pairs at J=1 plus 30 clone~near pairs."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    near = base.rsplit(" ", 1)[0] + " CHANGED"
    rows = [(f"clone-{i:03d}", base) for i in range(30)]
    rows += [("near-dup", near), ("unrelated", "one two three four five")]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    assert (
        jaccard_pairs(df, n=3, threshold=0.5, max_doc_freq=8).collect() == []
    )

    got = _collect(prefix_jaccard_pairs(df, threshold_ppm=500_000, n=3))
    clone_pairs = {
        (f"clone-{i:03d}", f"clone-{j:03d}")
        for i in range(30)
        for j in range(i + 1, 30)
    }
    near_pairs = {(f"clone-{i:03d}", "near-dup") for i in range(30)}
    assert set(got) == clone_pairs | near_pairs
    assert all(got[p] == (18, 18, 1_000_000) for p in clone_pairs)
    # near-dup: 18 shingles each; the changed word 20 appears only in
    # the final trigram -> inter 17, union 19
    assert all(got[p] == (17, 19, 894_736) for p in near_pairs)


def test_shingle_mode_agrees_with_uncapped_inverted_index(spark):
    """With the df cap disabled, jaccard_pairs is also exact — the two
    independent exact algorithms must emit identical pair sets and
    agree on inter/union (ppm vs float rounding aside)."""
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(12)]
    rows = [
        (f"d{i:02d}", " ".join(rng.choices(vocab, k=rng.randint(6, 20))))
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pf = _collect(prefix_jaccard_pairs(df, threshold_ppm=400_000, n=3))
    inv = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            df, n=3, threshold=0.4, max_doc_freq=10**9
        ).collect()
    }
    assert set(pf) == set(inv)
    for p, (inter, union, ppm) in pf.items():
        assert abs(inv[p] - inter / union) < 1e-6
        assert ppm == inter * 1_000_000 // union


def test_empty_and_null_text_excluded(spark):
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z"), ("c", ""), ("d", None), ("e", "  ")],
        "doc_id string, text string",
    )
    got = _collect(prefix_jaccard_pairs(df, threshold_ppm=500_000))
    assert set(got) == {("a", "b")}
    # and the set representation itself drops them
    ids = {r.id for r in token_sets(df).select("id").distinct().collect()}
    assert ids == {"a", "b"}


def test_invalid_threshold_raises(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(df, threshold_ppm=0)
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(df, threshold_ppm=1_000_001)
