"""Materialize the committed golden parquet files for the q19/q20 hard
oracles (driver CORRECTNESS gate).

The goldens are computed WITHOUT running the Spark pipeline:
- q19: per-document expected header/typed output predicted by the
  independent Python mini-shredder (fixtures/oracle_shred.py) over the
  generator's ground-truth fields map
- q20: the generator's golden span classification, exploded

They are deterministic in (n_docs=150, base=30000, seed=42) — exactly the
corpus __spark_entry__._q19/_q20 build — so the files are committed to the
repo and the oracle SQL reads them with DuckDB read_parquet().

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from horus_spark.fixtures.generator import generate_batch  # noqa: E402
from horus_spark.fixtures.oracle_shred import expected_shred  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "horus_spark", "fixtures", "goldens",
)

N_DOCS, BASE, SEED = 150, 30000, 42


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    docs = generate_batch(range(BASE + 1, BASE + 1 + N_DOCS), SEED)

    import hashlib

    q19_rows = []
    for d in docs:
        # S4 thumbprint golden: md5 over the record-separator-joined span
        # texts, formatted as the reference's BitConverter hex pairs
        # (DocumentProcessor.cs:217-223) — computed with hashlib, fully
        # independent of the Spark expression
        joined = "\x1e".join(s["text"] for s in d["spans"])
        hx = hashlib.md5(joined.encode("utf-8")).hexdigest().upper()
        thumb = " ".join(hx[i : i + 2] for i in range(0, 32, 2))
        # every generator document is well-formed, so the recognizer MUST
        # succeed on all of them: a constant golden column, but any doc
        # that silently degrades to the error channel now breaks the hash
        row = {
            "doc_id": d["doc_id"],
            "thumbprint": thumb,
            "recognizer_status": "succeeded",
            **expected_shred(d["fields"]),
        }
        q19_rows.append(row)
    q19 = pd.DataFrame(q19_rows)
    q19_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("thumbprint", pa.string()),
            ("recognizer_status", pa.string()),
            ("document_number", pa.string()),
            ("tax_period", pa.string()),
            ("account", pa.string()),
            ("post_code", pa.string()),
            ("net_total", pa.float64()),
            ("grand_total", pa.float64()),
            ("n_lines", pa.int32()),
            ("n_errors", pa.int32()),
            ("is_valid", pa.bool_()),
        ]
    )
    q19 = q19[[f.name for f in q19_schema]]
    pq.write_table(
        pa.Table.from_pandas(q19, schema=q19_schema, preserve_index=False),
        os.path.join(GOLDEN_DIR, "q19_expected_documents.parquet"),
    )

    q20_rows = [
        {
            "doc_id": d["doc_id"],
            "kind": s["kind"],
            "text": s["text"],
            "offset": s["offset"],
            "media_ref": s["media_ref"],
        }
        for d in docs
        for s in d["expected_spans"]
    ]
    q20 = pd.DataFrame(q20_rows)
    q20_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("kind", pa.string()),
            ("text", pa.string()),
            ("offset", pa.int32()),
            ("media_ref", pa.string()),
        ]
    )
    q20 = q20[[f.name for f in q20_schema]]
    pq.write_table(
        pa.Table.from_pandas(q20, schema=q20_schema, preserve_index=False),
        os.path.join(GOLDEN_DIR, "q20_expected_spans.parquet"),
    )
    print(f"wrote {len(q19)} q19 rows, {len(q20)} q20 rows to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
