"""A8: inspection asset counts — the reference Inspector's storage-audit
scoring (reference Horus.Inspector/Inspector.cs:435-506), as declarative
aggregations over an asset-listing table (container, name).

Point rules reproduced exactly:
- raw training pdfs: 10 points each, counted up to 10 per container
  (Inspector.cs:478-484,497)
- labelled docs (*.pdf.labels.json): 25 points each, up to 10 per
  container (Inspector.cs:486-492,498)
- labelling project (*.fott): flat 500 per file (Inspector.cs:494-496)
- orchestration containers: 1 point each, capped at 500 total
  (Inspector.cs:436-445)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asset_count_scores(
    assets: DataFrame, container_col: str = "container", name_col: str = "name"
) -> DataFrame:
    """Per-container training-asset points:
    (container, n_pdf, n_labels, n_fott, pdf_points, label_points,
    fott_points, total_points)."""
    lower = F.lower(F.col(name_col))
    is_pdf = lower.endswith(".pdf")
    is_labels = lower.endswith(".pdf.labels.json")
    is_fott = lower.endswith(".fott")
    per = assets.groupBy(F.col(container_col).alias("container")).agg(
        F.sum(is_pdf.cast("int")).alias("n_pdf"),
        F.sum(is_labels.cast("int")).alias("n_labels"),
        F.sum(is_fott.cast("int")).alias("n_fott"),
    )
    pdf_pts = F.lit(10) * F.least(F.col("n_pdf"), F.lit(10))
    label_pts = F.lit(25) * F.least(F.col("n_labels"), F.lit(10))
    fott_pts = F.lit(500) * F.col("n_fott")
    return per.select(
        "container",
        "n_pdf",
        "n_labels",
        "n_fott",
        pdf_pts.alias("pdf_points"),
        label_pts.alias("label_points"),
        fott_pts.alias("fott_points"),
        (pdf_pts + label_pts + fott_pts).alias("total_points"),
    )


def orchestration_container_points(
    assets: DataFrame, container_col: str = "container"
) -> DataFrame:
    """1 point per distinct container, capped at 500 (Inspector.cs:436-445).
    -> single row (n_containers, points)."""
    return assets.agg(
        F.count_distinct(F.col(container_col)).alias("n_containers")
    ).select(
        "n_containers",
        F.least(F.col("n_containers"), F.lit(500)).cast("long").alias("points"),
    )
