"""Accuracy scoring — port of the reference Inspector's field-level
comparison (reference Horus.Inspector/Inspector.cs:282-423).

Comparator semantics preserved exactly (Inspector.cs:292-306):
- strings: exact equality
- dates:   day granularity (actual ?? DateTime.MinValue)
- decimals/doubles: rounded to 2dp before comparison — with C#
  Math.Round semantics, i.e. HALF-EVEN (banker's): Spark bround, not round

Scoring quirks preserved exactly:
- header: 7 fields, points = int(20 * matches / 7)   (Inspector.cs:353-357)
- lines: DOCUMENT_LINE_POINTS = 80 / n_expected_lines with C# INTEGER
  division (80 and Count() are ints; Inspector.cs:366-367), so a fully
  matched 3-line document scores 20 + 3*26 = 98, not 100
- LineQuantity falls back to CalculatedLineQuantity (Inspector.cs:395-398)
- Taxableindicator compares as bool(non-empty)      (Inspector.cs:389-391)
- unmatched expected lines simply score no points   (Inspector.cs:376-383)

`desc_join`: the reference compares ItemDescription against
$"{ProductCode}{ProductDescription}".Trim() (Inspector.cs:385 — no space);
our expected tables store isbn/title separately, so the default is a single
space (set "" for bug-for-bug parity with the reference's concatenation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_documents(
    actual: DataFrame,
    expected_documents: DataFrame,
    expected_lines: DataFrame,
    desc_join: str = " ",
) -> DataFrame:
    """-> (doc_id, header_points, line_points, score) per expected doc that
    has an extracted counterpart (reference skips unprocessed docs,
    Inspector.cs:262-274)."""
    e = expected_documents.select(
        "doc_id",
        F.col("account").alias("e_account"),
        F.col("postal_code").alias("e_postcode"),
        F.col("document_date").alias("e_date"),
        F.col("pre_tax_total").alias("e_net"),
        F.col("tax_total").alias("e_vat"),
        F.col("shipping_total").alias("e_ship"),
        F.col("grand_total").alias("e_grand"),
    )
    a = actual.select(
        "doc_id", "account", "post_code", "tax_date",
        "net_total", "vat_amount", "shipping_total", "grand_total",
    )
    j = e.join(a, "doc_id", "inner")

    def b2i(c):
        return F.when(c, 1).otherwise(0)

    header_matches = (
        b2i(F.col("account") == F.col("e_account"))
        + b2i(F.bround("grand_total", 2) == F.bround("e_grand", 2))
        + b2i(F.bround("shipping_total", 2) == F.bround("e_ship", 2))
        + b2i(F.bround("net_total", 2) == F.bround("e_net", 2))
        + b2i(F.bround("vat_amount", 2) == F.bround("e_vat", 2))
        + b2i(F.col("post_code") == F.col("e_postcode"))
        + b2i(
            F.to_date(F.coalesce(F.col("tax_date"), F.lit("0001-01-01").cast("timestamp")))
            == F.to_date("e_date")
        )
    )
    header = j.select(
        "doc_id", F.floor(F.lit(20) * header_matches / 7).cast("int").alias("header_points")
    )

    el = expected_lines.select(
        "doc_id",
        F.lpad("line_number", 2, "0").alias("line_no"),
        F.trim(F.concat_ws(desc_join, "isbn", "title")).alias("e_desc"),
        F.col("price").alias("e_price"),
        F.col("taxable").alias("e_taxable"),
        F.col("quantity").alias("e_qty"),
        F.col("discounted_goods_value").alias("e_net_amt"),
        F.col("discount").alias("e_disc"),
    )
    n_exp = el.groupBy("doc_id").agg(F.count("*").alias("n_expected"))
    al = actual.select("doc_id", F.explode("line_items").alias("li")).select(
        "doc_id",
        F.col("li.line_no").alias("line_no"),
        F.col("li.item_description").alias("a_desc"),
        F.col("li.unit_price").alias("a_price"),
        F.col("li.taxable_indicator").alias("a_tax"),
        F.col("li.line_quantity").alias("a_qty"),
        F.col("li.calculated_line_quantity").alias("a_calc_qty"),
        F.col("li.net_amount").alias("a_net_amt"),
        F.col("li.discount_percent").alias("a_disc"),
    )
    lj = el.join(al, ["doc_id", "line_no"], "left").join(n_exp, "doc_id")
    qty_direct = F.bround(
        F.coalesce(F.expr("try_cast(a_qty as double)"), F.lit(0.0)), 2
    ) == F.bround("e_qty", 2)
    # Reference parity: Inspector.cs:392-398 computes the DIRECT compare first
    # (TryParse(LineQuantity) else 0 — so an unparseable/empty quantity
    # comparing equal to an expected 0 MATCHES, by reference design) and
    # runs the CalculatedLineQuantity compare iff the direct one failed.
    # "direct, else calculated" has the truth table of a plain OR, which
    # is what b2i(qty_direct | qty_fallback) encodes below.
    qty_fallback = F.bround("a_calc_qty", 2) == F.bround("e_qty", 2)
    line_matches = F.when(
        F.col("a_desc").isNotNull() | F.col("a_price").isNotNull(),
        b2i(F.col("a_desc") == F.col("e_desc"))
        + b2i(F.bround("a_price", 2) == F.bround("e_price", 2))
        + b2i((F.col("a_tax").isNotNull() & (F.col("a_tax") != "")) == F.col("e_taxable"))
        + b2i(qty_direct | qty_fallback)
        + b2i(F.bround("a_net_amt", 2) == F.bround("e_net_amt", 2))
        + b2i(F.bround("a_disc", 2) == F.bround("e_disc", 2)),
    )
    # C# integer division: 80 / n_expected truncated
    per_line_pts = F.floor(F.lit(80) / F.col("n_expected"))
    line_pts = F.when(
        line_matches.isNotNull(), F.floor(per_line_pts * line_matches / 6).cast("int")
    ).otherwise(F.lit(0))
    lines = lj.groupBy("doc_id").agg(F.sum(line_pts).cast("int").alias("line_points"))

    return (
        header.join(lines, "doc_id", "left")
        .fillna({"line_points": 0})
        .select(
            "doc_id",
            "header_points",
            "line_points",
            (F.col("header_points") + F.col("line_points")).alias("score"),
        )
    )


def score_summary(scores: DataFrame, team_col: str = "team") -> DataFrame:
    """A7: per-team score rollup — records.Sum(s => s.Score) per team
    (reference Horus.Inspector/Inspector.cs:132-149). -> (team, total_score,
    n_documents)."""
    return (
        scores.groupBy(F.col(team_col).alias("team"))
        .agg(
            F.sum("score").cast("long").alias("total_score"),
            F.count("*").alias("n_documents"),
        )
    )


def write_scores_with_flip(scores: DataFrame, out_dir: str) -> None:
    """A7 persistence: the reference flips every CURRENT detail row to
    PREVIOUS, then inserts the new run as CURRENT, in one transaction
    (Inspector.cs:116-160 UpdateDatabase). Spark-native equivalent over a
    status-partitioned parquet layout:

        out_dir/status=PREVIOUS/   <- every superseded run accumulates here
        out_dir/status=CURRENT/    <- exactly the latest run

    The flip appends the old CURRENT into PREVIOUS before overwriting
    CURRENT, so re-running after a crash between the two writes loses
    nothing (worst case the old CURRENT exists in both; the CURRENT
    overwrite then restores the invariant)."""
    import os

    spark = scores.sparkSession
    cur_dir = os.path.join(out_dir, "status=CURRENT")
    prev_dir = os.path.join(out_dir, "status=PREVIOUS")
    if os.path.exists(os.path.join(cur_dir, "_SUCCESS")):
        spark.read.parquet(cur_dir).write.mode("append").parquet(prev_dir)
    scores.write.mode("overwrite").parquet(cur_dir)
