"""S2: content-type admission filter.

The reference's JobMonitor drops events that are not BlockBlob creations
with a whitelisted content type before any processing starts — reference
Horus.Functions/JobMonitor.cs:71-93 (CanProcessMessage), allowed list
Models/BaseConstants.cs:10. Same predicate, applied declaratively at the
source so Catalyst pushes it into the scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horus_spark import constants as C


def admission_predicate(
    content_type_col: str = "content_type", blob_type_col: str | None = None
) -> "F.Column":
    cond = F.col(content_type_col).isin(C.ALLOWED_CONTENT_TYPES)
    if blob_type_col is not None:
        cond = cond & (F.col(blob_type_col) == F.lit("BlockBlob"))
    return cond


def admit(
    df: DataFrame,
    content_type_col: str = "content_type",
    blob_type_col: str | None = None,
) -> DataFrame:
    """Keep only processable documents (pushed-down isin filter)."""
    return df.filter(admission_predicate(content_type_col, blob_type_col))


def rejected(
    df: DataFrame,
    content_type_col: str = "content_type",
    blob_type_col: str | None = None,
) -> DataFrame:
    """The complement — what JobMonitor logs-and-drops; null content types
    are rejected too (isin is null-safe here via the explicit coalesce)."""
    return df.filter(
        ~F.coalesce(admission_predicate(content_type_col, blob_type_col), F.lit(False))
    )
