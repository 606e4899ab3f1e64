"""L5: text-span boilerplate scoring — pure Spark expressions (no UDF).

A CETD/Readability-lite block scorer for the text branch of the span
stream (the north rule's HTML-boilerplate strip; the reference corpus has
no HTML — this covers the interleaved-document generalization):

- link density: any '<a href' anchor tags -> navigation/footer chrome
- separator chrome: >=2 ' | ' or ' - ' delimiters with no sentence text
  (letterhead/footer address lines)
- fragment length: < 4 tokens (logos, page furniture)

Everything stays in whole-stage codegen; the thresholds are deterministic
so golden span classification is exactly reproducible at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_boilerplate_text(text: Column) -> Column:
    links = F.size(F.split(text, "<a href", -1)) - 1
    pipes = F.size(F.split(text, r" \| ", -1)) - 1
    dashes = F.size(F.split(text, " - ", -1)) - 1
    tokens = F.size(F.split(F.trim(text), " +", -1))
    return (links > 0) | (pipes >= 2) | (dashes >= 2) | (tokens < 4)
