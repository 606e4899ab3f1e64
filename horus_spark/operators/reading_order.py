"""Multi-column reading order for parsed page layouts.

The L1 word->line clustering (layout.py) orders fragments row-major:
top-to-bottom, left-to-right. Correct for single-column forms — but a
two-column page (papers, newsletters, brochure PDFs) read row-major
INTERLEAVES the columns, shredding every sentence at the column gutter.
Real extraction stacks (pdftotext's physical-layout mode, Grobid,
LayoutParser) detect the gutter first and emit column-major order.

`column_reading_order` is that detector as pure relational expressions:

1. Per (doc, page), fragments sorted by x0; the classic interval-union
   sweep (running max of x1 over preceding fragments) finds vertical
   WHITESPACE VALLEYS no fragment crosses — candidate gutters.
2. A gutter qualifies if its width >= min_gap (inches) and both sides
   hold >= min_side_frac of the page's fragments (a margin note or a
   ragged right edge must not split the page).
3. The WIDEST qualifying gutter (tie: leftmost) splits the page;
   fragments order by (column, y0, x0). No qualifying gutter ->
   single column, row-major order unchanged.

One level of split = two columns, the dominant real-world case; run
the operator recursively per column for 3+ column layouts.

Scale shape: two window passes + one aggregation join, all keyed by
(doc_id, page) — Exchange-compatible with the layout pipeline's
existing partitioning, no UDF, no collect. Determinism: the only
arithmetic is IEEE max/compare on the input floats plus one midpoint
average, identical in any engine — the DuckDB oracle replays the sweep
with the same window functions and hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def column_reading_order(
    frags: DataFrame,
    min_gap: float = 0.5,
    min_side_frac: float = 0.2,
    doc_col: str = "doc_id",
    page_col: str = "page",
) -> DataFrame:
    """Input: one row per fragment with (doc_col, page_col, frag_id,
    x0, y0, x1, y1). Output: the input plus (n_columns, col_idx,
    read_ord) — read_ord is the 0-based column-major reading position
    within (doc, page). Fragments exactly ON a gutter boundary cannot
    exist (a gutter is by construction crossed by no fragment)."""
    d, p = F.col(doc_col), F.col(page_col)
    w_sweep = (
        Window.partitionBy(d, p)
        .orderBy(F.col("x0"), F.col("x1"), F.col("frag_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = frags.withColumn("_reach", F.max("x1").over(w_sweep))
    # a gutter exists before this fragment iff every preceding fragment
    # ends at least min_gap to the left of this one's start
    gaps = swept.select(
        d.alias("_d"),
        p.alias("_p"),
        (F.col("x0") - F.col("_reach")).alias("_width"),
        ((F.col("x0") + F.col("_reach")) / F.lit(2.0)).alias("_cut"),
        F.col("_reach").alias("_reach"),
    ).where(
        F.col("_reach").isNotNull() & (F.col("x0") - F.col("_reach") >= min_gap)
    ).distinct()  # two right-column frags sharing x0 see the SAME gutter;
    # without the dedup the balance join below would double-count _left
    counts = frags.groupBy(d.alias("_d"), p.alias("_p")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    sided = (
        gaps.join(counts, ["_d", "_p"])
        .join(
            frags.select(
                d.alias("_d"), p.alias("_p"), F.col("x1").alias("_fx1")
            ),
            ["_d", "_p"],
        )
        .groupBy("_d", "_p", "_width", "_cut", "_n")
        .agg(
            F.sum((F.col("_fx1") <= F.col("_cut")).cast("long")).alias("_left")
        )
        .where(
            (F.col("_left") >= F.col("_n") * min_side_frac)
            & ((F.col("_n") - F.col("_left")) >= F.col("_n") * min_side_frac)
        )
    )
    w_best = Window.partitionBy("_d", "_p").orderBy(
        F.desc("_width"), F.asc("_cut")
    )
    best = (
        sided.withColumn("_rk", F.row_number().over(w_best))
        .where(F.col("_rk") == 1)
        .select("_d", "_p", "_cut")
    )
    joined = frags.join(
        best,
        (d == F.col("_d")) & (p == F.col("_p")),
        "left",
    ).drop("_d", "_p")
    out = joined.withColumn(
        "n_columns",
        F.when(F.col("_cut").isNotNull(), F.lit(2)).otherwise(F.lit(1)),
    ).withColumn(
        "col_idx",
        F.when(
            F.col("_cut").isNotNull() & (F.col("x0") > F.col("_cut")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_read = Window.partitionBy(d, p).orderBy(
        F.col("col_idx"), F.col("y0"), F.col("x0"), F.col("frag_id")
    )
    return out.withColumn(
        "read_ord", (F.row_number().over(w_read) - 1).cast("int")
    ).drop("_cut")
