"""dedup_pipeline: the exact-first composition provably preserves recall
that raw jaccard_pairs drops under mass duplication (the module-docstring
caveat as an executable test)."""

import warnings

import pytest
from pyspark.sql import functions as F

from horus_spark.operators.dedup import dedup_pipeline, jaccard_pairs

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau upsilon"
)
NEAR = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau CHANGED"
)
OTHER = "one two three four five six seven eight nine ten eleven twelve"


@pytest.fixture(scope="module")
def corpus(spark):
    # a mass-duplicated cluster: 30 byte-identical clones of BASE,
    # plus one near-duplicate of it and one unrelated doc
    rows = [(f"clone-{i:03d}", BASE) for i in range(30)]
    rows.append(("near-dup", NEAR))
    rows.append(("unrelated", OTHER))
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_raw_jaccard_drops_mass_duplicated_cluster(corpus):
    """With max_doc_freq below the cluster size, every shingle the clones
    share is hot; raw jaccard_pairs finds NOTHING involving them."""
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pairs = jaccard_pairs(
            corpus, n=3, threshold=0.5, max_doc_freq=8, log_pruned=True
        ).collect()
    assert pairs == []  # the exact failure mode the caveat documents
    assert any("pruned" in str(x.message) for x in w)  # and it warned


def test_pipeline_preserves_recall(corpus):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dedup_pipeline(corpus, n=3, threshold=0.5, log_collapsed=True)
        exact = out["exact"].cache()
        # exact tier: the 30 clones form ONE group under one canonical id
        groups = {
            r.canonical_id: r.group_size
            for r in exact.join(
                exact.groupBy("thumbprint").agg(F.count("*").alias("group_size")),
                "thumbprint",
            )
            .select("canonical_id", "group_size")
            .distinct()
            .collect()
        }
        assert groups["clone-000"] == 30
        # collapsed-clone counter fired
        assert any("collapsed 29 clone rows" in str(x.message) for x in w)
        # canonical set: one clone representative + near-dup + unrelated
        canon = {r.doc_id for r in out["canonical_docs"].select("doc_id").collect()}
        assert canon == {"clone-000", "near-dup", "unrelated"}
        # fuzzy tier over canonicals RECOVERS the near-dup relation that
        # the raw inverted index provably dropped above
        fuzzy = out["fuzzy_pairs"].collect()
        assert {(r.id_a, r.id_b) for r in fuzzy} == {("clone-000", "near-dup")}
        assert all(r.jaccard >= 0.5 for r in fuzzy)
        exact.unpersist()


def test_pipeline_composition_launches_no_job(corpus):
    """Composing the pipeline must be free: at 100 TB an eager count()
    inside the operator is a second corpus-scale pass before any useful
    work. With the default log_collapsed=False, no Spark job may run
    until the caller acts on an output; the clone counter is returned as
    the lazy `collapsed_count` frame instead."""
    sc = corpus.sparkSession.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or []) | {
        j for j in (tracker.getActiveJobsIds() or [])
    }
    n_before = max([*before, -1])
    out = dedup_pipeline(corpus, n=3, threshold=0.5)
    after = tracker.getJobIdsForGroup(None) or []
    new_jobs = [j for j in after if j > n_before] + list(
        tracker.getActiveJobsIds() or []
    )
    assert new_jobs == [], f"dedup_pipeline launched jobs eagerly: {new_jobs}"
    # the counter is still available — just priced on demand
    assert out["collapsed_count"].collect()[0].n_collapsed == 29


def test_exact_dedup_keeps_null_text_rows(spark):
    """Review finding (execution-confirmed): md5(NULL) is NULL and the
    inner join on thumbprint dropped null-text docs entirely. They must
    survive as their own singletons — and must NOT group together (two
    absent texts are not identical content)."""
    from horus_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [("d1", "same"), ("d2", None), ("d3", None), ("d4", "same")],
        "doc_id string, text string",
    )
    rows = {r["id"]: r for r in exact_dedup(df).collect()}
    assert set(rows) == {"d1", "d2", "d3", "d4"}
    assert rows["d2"]["canonical_id"] == "d2" and not rows["d2"]["is_duplicate"]
    assert rows["d3"]["canonical_id"] == "d3" and not rows["d3"]["is_duplicate"]
    assert rows["d4"]["canonical_id"] == "d1" and rows["d4"]["is_duplicate"]


def test_banding_guards_reject_degenerate_configs(spark):
    """Review finding (execution-confirmed): bands > k floored every
    band bucket to the empty string and the bucket join degenerated to
    ALL-PAIRS — the O(n^2) explosion banding exists to prevent."""
    from horus_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_pairs,
    )

    df = spark.createDataFrame(
        [(f"d{i}", f"text number {i} entirely distinct") for i in range(4)],
        "doc_id string, text string",
    )
    sigs = minhash_signatures(df, k=8)
    with pytest.raises(ValueError):
        lsh_candidate_pairs(sigs, bands=16, k=8)
    with pytest.raises(ValueError):
        lsh_candidate_pairs(sigs, bands=3, k=8)  # remainder hashes ignored
    with pytest.raises(ValueError):
        simhash_pairs(df, bits=32, bands=33, max_hamming=3)
    with pytest.raises(ValueError):
        simhash_pairs(df, bits=32, bands=3, max_hamming=2)


def test_q183_recall_audit_shape(spark):
    """The dedup-recall audit (q183): planted light-mutation clones are
    mostly found; heavy mutations fall below the verify threshold."""
    import __spark_entry__ as e

    rows = {
        r["level"]: r.asDict()
        for r in e.queries()["q183_dedup_recall"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows[1]["n_planted"] == rows[2]["n_planted"] > 0
    # light mutation: banding theory puts recall high but < 100%
    assert 700_000 <= rows[1]["recall_ppm"] <= 1_000_000
    # heavy mutation: jaccard below the 0.3 verify cut -> ~zero
    assert rows[2]["recall_ppm"] <= 100_000
    assert rows[1]["recall_ppm"] == (
        rows[1]["n_found"] * 1_000_000 // rows[1]["n_planted"]
    )
