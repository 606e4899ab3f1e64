"""Scanned-page skew estimation and deskewed line recovery.

Scanned forms arrive rotated by a degree or two (feeder skew), and the
L1 row-clustering tolerance (layout.py, ROW_Y_TOL) breaks once the
baseline drift across the page width exceeds the line pitch: words from
adjacent printed lines interleave in y. The standard fix is estimated
deskew: fit the dominant baseline slope, shear y by it, then cluster.

This module does the fit in EXACT integer arithmetic so it is
bit-reproducible across partitionings and engines:

- coordinates snap to micro-inches (round(x * 1e6) as long);
- the least-squares slope over each page's word centers,
      slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),
  runs its product sums in DECIMAL(38,0) (a page of 1e4 words pushes
  Sxy past int64) and is emitted as integer ppm with an explicit
  sign-magnitude division (|num| * 1e6 div den, sign applied after —
  truncation-direction-proof: engines disagree on negative integer
  division, sign-magnitude makes the question moot);
- the shear y' = y - slope*x uses the same sign-magnitude trick;
- deskewed lines = gaps > `line_gap` micro-inches in the sorted
  distinct y' sequence.

Why least-squares and not Hough/projection profiles: word centers are
already available from the OCR scan (no raster access here), the LS
slope is the maximum-likelihood fit for small angles, and it reduces
to two window aggregates — no kernel, no shuffle beyond the per-page
hash partitioning the layout pipeline already has.

Scale shape: one hash Exchange on (doc, page) feeding two window
passes and a final per-page aggregate; all state is per-page scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "DECIMAL(38,0)"


def estimate_skew(
    words: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
    x_col: str = "xc",
    y_col: str = "yc",
    line_gap: int = 150_000,
) -> DataFrame:
    """Per (doc, page): (n_words, slope_ppm, n_lines) — the LS baseline
    slope in integer ppm and the line count AFTER shearing it out.
    x/y are word-center coordinates in inches (doubles); pages with
    zero x-variance report slope 0."""
    d, p = F.col(doc_col), F.col(page_col)
    w = words.select(
        d.alias("_d"),
        p.alias("_p"),
        F.round(F.col(x_col) * 1_000_000).cast("long").alias("xm"),
        F.round(F.col(y_col) * 1_000_000).cast("long").alias("ym"),
    )
    win = Window.partitionBy("_d", "_p")
    xd = F.col("xm").cast(_DEC)
    yd = F.col("ym").cast(_DEC)
    s = (
        w.withColumn("_n", F.count(F.lit(1)).over(win))
        .withColumn("_sx", F.sum("xm").over(win).cast(_DEC))
        .withColumn("_sy", F.sum("ym").over(win).cast(_DEC))
        .withColumn("_sxx", F.sum(xd * xd).over(win))
        .withColumn("_sxy", F.sum(xd * yd).over(win))
    )
    num = F.col("_n").cast(_DEC) * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("_n").cast(_DEC) * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    mag = F.expr(
        "CAST((abs(__num) * 1000000) div __den AS BIGINT)"
    )
    s = s.withColumn("__num", num).withColumn("__den", den)
    slope = (
        F.when(F.col("__den") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.when(F.col("__num") < 0, -mag).otherwise(mag)
        )
        .alias("slope_ppm")
    )
    s = s.withColumn("slope_ppm", slope)
    # shear: y' = y - slope*x, sign-magnitude division again
    shear_mag = F.expr("(abs(slope_ppm) * xm) div 1000000")
    yprime = F.when(
        F.col("slope_ppm") < 0, F.col("ym") + shear_mag
    ).otherwise(F.col("ym") - shear_mag)
    s = s.withColumn("yp", yprime)
    # deskewed line count: gaps > line_gap in the sorted y' sequence
    w_seq = Window.partitionBy("_d", "_p").orderBy("yp")
    gap = F.col("yp") - F.lag("yp").over(w_seq)
    s = s.withColumn(
        "_newline",
        F.when(gap.isNull() | (gap > line_gap), F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        s.groupBy(
            F.col("_d").alias(doc_col), F.col("_p").alias(page_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.first("slope_ppm").alias("slope_ppm"),
            F.sum("_newline").cast("int").alias("n_lines"),
        )
    )
