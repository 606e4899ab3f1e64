"""L3/L4: key-value field extraction from inferred layout.

Produces the flat fields map the shredder consumes — the native equivalent
of the reference's trained-model output
(analyzeResult.documentResults[0].fields, consumed at
reference Horus.Functions/Engines/Processing/HorusProcessingEngine.cs:25;
key taxonomy per reference Horus.Generator/quickstart/fields.json: 8 header
keys + Drug/Qty/Unit/Disc/Taxable/Net{NN}).

Runs per document on the fragments + grid from operators.layout; pure
pandas/numpy inside an Arrow-batched UDF.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from horus_spark.config import FORMAT_CONFIGS, POSTCODE_RE, TOTALS_LABELS


def _cell_join(f: pd.DataFrame, idxs: list[int]) -> str:
    sub = sorted(idxs, key=lambda i: (f.at[i, "y0"], f.at[i, "x0"]))
    return " ".join(f.at[i, "text"] for i in sub)


def extract_fields(frags: pd.DataFrame, grid: dict, fmt: str) -> tuple[dict, set]:
    """-> (fields {key: text}, contributing fragment positional ids)."""
    cfg = FORMAT_CONFIGS.get(fmt, FORMAT_CONFIGS["abc"])
    f = frags.reset_index(drop=True)
    fields: dict[str, str] = {}
    used: set[int] = set()

    def reg(key, value, idxs):
        fields[key] = value
        used.update(int(i) for i in idxs)

    table_top = grid.get("table_top", np.inf)

    # ---------------- header anchors ----------------
    for i, t in enumerate(f["text"]):
        y = f.at[i, "y0"]
        if "inv" in cfg:
            m = re.match(cfg["inv"], t)
            if m and "Inv" not in fields:
                reg("Inv", m.group(1), [i])
                continue
        if "ac_inv" in cfg:
            m = re.match(cfg["ac_inv"], t)
            if m:
                reg("AccountNo", m.group(1), [i])
                reg("Inv", m.group(2), [i])
                continue
        if "account_prefix" in cfg and t.startswith(cfg["account_prefix"]):
            reg("AccountNo", t[len(cfg["account_prefix"]):], [i])
            continue
        if (
            "account_addr" in cfg
            and y < table_top
            and "AccountNo" not in fields
            and re.match(cfg["account_addr"], t)
        ):
            reg("AccountNo", t, [i])
            continue
        if "date_prefix" in cfg and t.startswith(cfg["date_prefix"]):
            reg("TaxDate", t[len(cfg["date_prefix"]):], [i])
            continue
        if (
            "date_standalone" in cfg
            and "TaxDate" not in fields
            and y < table_top
            and re.match(cfg["date_standalone"], t)
        ):
            reg("TaxDate", t, [i])
            continue
        m = re.match(POSTCODE_RE, t)
        if m and y < table_top and "PostCode" not in fields:
            reg("PostCode", f"{m.group(1)} {m.group(2)}", [i])

    # ---------------- totals (label-anchored, same visual row) -------------
    # totals cells are value fragments; find the label fragment on the same
    # row (to the left) to name them
    for tc in grid.get("totals_cells", []):
        vi = tc["frag_idx"][0]
        vy = f.at[vi, "y0"]
        labels = f[
            (f["y0"] - vy).abs().lt(0.06) & (f["x1"] < f.at[vi, "x0"])
        ]
        if len(labels) == 0:
            continue
        label_text = " ".join(labels.sort_values("x0")["text"])
        for prefix, key in TOTALS_LABELS:
            if label_text.startswith(prefix) and key not in fields:
                reg(key, f.at[vi, "text"], [vi])
                break

    # ---------------- line-item fields from the grid ----------------
    if not grid:
        return fields, used
    n_cols = grid["n_cols"]
    cells = grid["cells"]
    anchor_rows: list[tuple[int, int]] = []  # (row, item_number)
    for (r, c), idxs in cells.items():
        if c == 0 and r > 0 and len(idxs) == 1:
            t = f.at[idxs[0], "text"]
            if re.fullmatch(r"\d{1,2}", t):
                anchor_rows.append((r, int(t)))
    anchor_rows.sort()
    n_item_rows = grid["n_rows"] - 1  # excl header

    # positional column semantics (col 0 = item number):
    if cfg["two_row_items"]:
        # [num, desc+qty, unit, disc, (tax), net]
        has_tax = n_cols >= 6
        col_desc, col_unit, col_disc = 1, 2, 3
        col_tax = 4 if has_tax else None
        col_net = n_cols - 1
    else:
        # [num, desc, qty, unit, disc, (tax), net]
        has_tax = n_cols >= 7
        col_desc, col_qty, col_unit, col_disc = 1, 2, 3, 4
        col_tax = 5 if has_tax else None
        col_net = n_cols - 1

    for ai, (r, item_no) in enumerate(anchor_rows):
        r_end = anchor_rows[ai + 1][0] if ai + 1 < len(anchor_rows) else n_item_rows + 1
        rows = range(r, r_end)
        nn = f"{item_no:02d}"

        def cell_rows(col, row_iter=rows):
            idxs = []
            for rr in row_iter:
                idxs.extend(cells.get((rr, col), []))
            return idxs

        if cfg["two_row_items"]:
            # last row of the item block is the qty/unit/disc/tax row;
            # desc rows are all earlier rows
            last_r = r_end - 1
            desc_idxs = cell_rows(col_desc, range(r, last_r))
            qty_idxs = cells.get((last_r, col_desc), [])
            unit_idxs = cell_rows(col_unit)
            disc_idxs = cell_rows(col_disc)
        else:
            desc_idxs = cell_rows(col_desc)
            qty_idxs = cell_rows(col_qty)
            unit_idxs = cell_rows(col_unit)
            disc_idxs = cell_rows(col_disc)
        net_idxs = cell_rows(col_net)
        tax_idxs = cell_rows(col_tax) if col_tax is not None else []

        if desc_idxs:
            reg(f"Drug{nn}", _cell_join(f, desc_idxs), desc_idxs)
        if qty_idxs:
            reg(f"Qty{nn}", _cell_join(f, qty_idxs), qty_idxs)
        if unit_idxs:
            reg(f"Unit{nn}", _cell_join(f, unit_idxs), unit_idxs)
        if disc_idxs:
            reg(f"Disc{nn}", _cell_join(f, disc_idxs), disc_idxs)
        if net_idxs:
            reg(f"Net{nn}", _cell_join(f, net_idxs), net_idxs)
        if tax_idxs:
            reg(f"Taxable{nn}", _cell_join(f, tax_idxs), tax_idxs)

    return fields, used


def field_line_ids(frags: pd.DataFrame, used: set) -> set[int]:
    """Original OCR line ids contributing words to any field value (feeds
    span classification: such media spans are 'form-field')."""
    f = frags.reset_index(drop=True)
    out: set[int] = set()
    for i in used:
        for (line_id, *_rest) in f.at[i, "words"]:
            out.add(int(line_id))
    return out
