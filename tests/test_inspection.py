"""A8 asset-count scoring caps (Inspector.cs:435-506)."""


def test_asset_caps_and_points(spark):
    from horus_spark.operators.inspection import (
        asset_count_scores,
        orchestration_container_points,
    )

    rows = [("c1", f"doc{i}.pdf") for i in range(15)]           # >10 pdfs
    rows += [("c1", f"doc{i}.pdf.labels.json") for i in range(3)]
    rows += [("c1", "proj.fott"), ("c2", "a.pdf"), ("c2", "b.FOTT")]
    assets = spark.createDataFrame(rows, "container string, name string")
    per = {r.container: r for r in asset_count_scores(assets).collect()}
    # pdf capped at 10 -> 100 pts; 3 labels -> 75; fott flat 500
    assert per["c1"].n_pdf == 15 and per["c1"].pdf_points == 100
    assert per["c1"].label_points == 75 and per["c1"].fott_points == 500
    assert per["c1"].total_points == 675
    assert per["c2"].total_points == 10 + 500  # case-insensitive .fott
    orch = orchestration_container_points(assets).collect()[0]
    assert orch.n_containers == 2 and orch.points == 2
