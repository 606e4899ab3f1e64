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
    # allocation-free forms (this runs per span, ~70 spans/doc): contains /
    # second-occurrence locate / regexp_count instead of split+size, which
    # materialized a string array per probe
    links = F.contains(text, F.lit("<a href"))
    p1 = F.locate(" | ", text)
    pipes2 = (p1 > 0) & (F.call_function("locate", F.lit(" | "), text, p1 + 3) > 0)
    d1 = F.locate(" - ", text)
    dashes2 = (d1 > 0) & (F.call_function("locate", F.lit(" - "), text, d1 + 3) > 0)
    tokens = F.regexp_count(F.trim(text), F.lit(" +")) + 1
    return links | pipes2 | dashes2 | (tokens < 4)
