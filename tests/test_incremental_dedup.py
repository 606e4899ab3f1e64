"""Incremental dedup: new batch vs a persisted corpus fingerprint index."""

import pytest
from pyspark.sql import functions as F

LONG_A = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega one two three "
    "four five six"
)
LONG_A_NEAR = LONG_A.rsplit(" ", 1)[0] + " seven"  # last word differs
LONG_B = (
    "red orange yellow green blue indigo violet crimson scarlet amber teal "
    "cyan magenta maroon olive navy coral ivory jade pearl ruby topaz onyx "
    "quartz slate bronze copper silver golden platinum"
)
LONG_B_NEAR = LONG_B.rsplit(" ", 1)[0] + " iron"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def verdicts(spark):
    from horus_spark.operators.dedup import build_dedup_index, incremental_dedup

    existing = _df(
        spark,
        [
            ("e1", LONG_A),
            ("e2", "completely unrelated existing content here"),
            ("e3", None),
            ("e4", "hi"),  # too short to shingle
        ],
    )
    batch = _df(
        spark,
        [
            ("n1", LONG_A),        # exact clone of e1 -> exact_existing
            ("n2", LONG_B),        # first of an in-batch exact pair
            ("n3", LONG_B),        # exact clone of n2 -> exact_batch
            ("n4", LONG_A_NEAR),   # near-dup of e1 -> near_existing
            ("n5", LONG_B_NEAR),   # near-dup of n2/n3 -> near_batch? see below
            ("n6", "entirely fresh text with nothing shared at all among these tokens"),
            ("n7", None),          # null text -> unique (never matches)
            ("n8", "so short"),    # < 3 tokens after split? 2 tokens -> no sig
        ],
    )
    idx = build_dedup_index(existing)
    v = incremental_dedup(batch, idx, threshold=0.3)
    return {r["doc_id"]: (r["verdict"], r["partner_id"]) for r in v.collect()}, (
        existing,
        batch,
        idx,
        v,
    )


def test_verdict_tiers(spark, verdicts):
    got, _ = verdicts
    assert got["n1"] == ("exact_existing", "e1")
    assert got["n3"] == ("exact_batch", "n2")
    assert got["n4"] == ("near_existing", "e1")
    # n5 is a near-dup of BOTH n2 and n3, but n3 is exact-resolved and
    # excluded from the near tier, so the partner is n2
    assert got["n5"] == ("near_batch", "n2")
    assert got["n2"] == ("unique", None)
    assert got["n6"] == ("unique", None)
    assert got["n7"] == ("unique", None)
    assert got["n8"] == ("unique", None)
    assert len(got) == 8  # every batch doc gets exactly one verdict


def test_extend_index_appends_unique_only(spark, verdicts):
    from horus_spark.operators.dedup import extend_dedup_index

    _, (existing, batch, idx, v) = verdicts
    idx2 = extend_dedup_index(idx, batch, v)
    ids = sorted(r["id"] for r in idx2.select("id").collect())
    # 4 existing + the 4 unique batch docs; duplicates never enter
    assert ids == ["e1", "e2", "e3", "e4", "n2", "n6", "n7", "n8"]
    # appended fingerprints are usable: re-running the SAME batch against
    # the extended index flags every formerly-unique doc as a duplicate
    from horus_spark.operators.dedup import incremental_dedup

    v2 = incremental_dedup(batch, idx2, threshold=0.3)
    got2 = {r["doc_id"]: r["verdict"] for r in v2.collect()}
    assert got2["n2"] == "exact_existing"
    assert got2["n6"] == "exact_existing"
    # null text still never matches anything, even its own fingerprint
    assert got2["n7"] == "unique"


def test_index_shape_and_guards(spark, verdicts):
    from horus_spark.operators.dedup import incremental_dedup

    _, (existing, batch, idx, _) = verdicts
    rows = {r["id"]: r for r in idx.collect()}
    assert rows["e3"]["content_md5"] is None and rows["e3"]["sig"] is None
    assert rows["e4"]["content_md5"] is not None and rows["e4"]["sig"] is None
    assert rows["e1"]["sig"] is not None and len(rows["e1"]["sig"]) == 64
    with pytest.raises(ValueError, match="bands"):
        incremental_dedup(batch, idx, bands=128)
    with pytest.raises(ValueError, match="divide"):
        incremental_dedup(batch, idx, bands=10)


def test_mass_duplicated_batch_exact_tier(spark):
    """A batch that is mostly copies of ONE document (hot-page re-crawl):
    every copy must verdict exact_batch with the group's min id as
    partner — pins the groupBy-min construction of the within-batch
    exact tier (the old digest self-join was O(copies^2))."""
    from horus_spark.operators.dedup import build_dedup_index, incremental_dedup

    existing = _df(spark, [("e1", LONG_B)])
    batch = _df(
        spark,
        [(f"n{i:02d}", LONG_A) for i in range(12)] + [("zz_fresh", LONG_B_NEAR)],
    )
    v = incremental_dedup(batch, build_dedup_index(existing), threshold=0.3)
    got = {r["doc_id"]: (r["verdict"], r["partner_id"]) for r in v.collect()}
    assert got["n00"] == ("unique", None)
    for i in range(1, 12):
        assert got[f"n{i:02d}"] == ("exact_batch", "n00"), got[f"n{i:02d}"]
    # near tier still runs over the exact-unresolved remainder
    assert got["zz_fresh"] == ("near_existing", "e1")
