"""PII detection / redaction over document text — the compliance pass a
training-data pipeline runs before anything ships: find emails, phone
numbers, IP addresses, and card-shaped digit runs; count them per doc;
optionally rewrite the text with typed placeholder tokens.

Everything is JVM-side regexp expressions (regexp_count /
regexp_replace) — zero Python, zero shuffle: detection and redaction
are pure map-side projections that run at scan speed and inherit the
scan's partitioning; a 100 TB corpus pays exactly one pass. Patterns
are deliberately simple, deterministic, and engine-portable (the same
POSIX-class regexes run in DuckDB for the oracle) — production systems
layer smarter recognizers on top, but the *pipeline shape* (vectorized
scan-stage rewrite, counts as first-class columns for downstream
filtering) is the part that matters at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters for redaction: emails first (their local part can look
# like a phone), then cards (longer digit runs) before phones, IPs last
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CARD>"),
    ("phone", r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per doc: match count per PII kind + total (map-side only).
    Returns (id_col, n_email, n_card, n_phone, n_ip, n_pii)."""
    t = F.col(text_col)
    counts = {
        kind: F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    }
    out = df.select(F.col(id_col), *counts.values())
    total = None
    for kind, _, _ in PII_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Rewrite text with typed placeholders, keeping every other column.
    Sequential regexp_replace chain in PII_PATTERNS order (emails before
    phones so an address's digits aren't double-redacted)."""
    t = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        t = F.regexp_replace(t, pat, token)
    return df.withColumn(out_col, t)


def rare_combinations(
    df: DataFrame,
    cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity-style quasi-identifier audit — the privacy check
    BESIDE content PII scanning (detect/redact handle what the text
    says; this handles what the METADATA reveals): a combination of
    quasi-identifier columns shared by fewer than `k` rows can
    re-identify its members when the dataset is joined against outside
    knowledge (Sweeney 2002), so releases either generalize those
    combos or drop them.

    One row per observed combination: the `cols` values, n_rows, and
    risky = (n_rows < k). NULL is a legal quasi-identifier value and
    groups as itself. ONE hash aggregation with map-side combine —
    combination cardinality, not corpus size, bounds the output."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2")
    agg = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    return agg.select(
        *cols, "n_rows", (F.col("n_rows") < k).alias("risky")
    )
