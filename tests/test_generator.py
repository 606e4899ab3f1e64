"""Generator determinism + golden arithmetic invariants
(reference Horus.Generator/Models/GeneratorDocument.cs:30-57,
GeneratorDocumentLineItem.cs:23-51)."""

import math

from horus_spark.fixtures.generator import corpus_pandas, generate_document


def test_deterministic():
    a = generate_document(30007)
    b = generate_document(30007)
    assert a == b


def test_different_docs_differ():
    assert generate_document(30007)["doc_id"] != generate_document(30008)["doc_id"] or (
        generate_document(30007)["fields"] != generate_document(30008)["fields"]
    )


def test_totals_chain():
    c = corpus_pandas(20)
    docs = c["expected_documents"].set_index("doc_id")
    lines = c["expected_lines"]
    for doc_id, g in lines.groupby("doc_id"):
        # integer-cent invariants (generator does exact money arithmetic)
        dgv_c = (g["discounted_goods_value"] * 100).round().astype(int)
        pre_c = dgv_c.sum()
        taxable_c = dgv_c[g["taxable"].to_numpy()].sum()
        tax_c = (taxable_c * 19 + 50) // 100
        ship_c = (pre_c * 15 + 50) // 100
        row = docs.loc[doc_id]
        assert math.isclose(row["pre_tax_total"], pre_c / 100, rel_tol=1e-12)
        assert math.isclose(row["tax_total"], tax_c / 100, rel_tol=1e-12, abs_tol=1e-12)
        assert math.isclose(row["shipping_total"], ship_c / 100, rel_tol=1e-12)
        assert math.isclose(
            row["grand_total"], (pre_c + tax_c + ship_c) / 100, rel_tol=1e-12
        )
        for _, l in g.iterrows():
            assert math.isclose(l["goods_value"], l["quantity"] * l["price"], rel_tol=1e-9)
            goods_tc = round(l["goods_value"] * 1000)
            assert round(l["discount_value"] * 100) == (
                goods_tc * int(l["discount"]) + 500
            ) // 1000
            assert round(l["discounted_goods_value"] * 100) == (
                goods_tc - round(l["discount_value"] * 100) * 10 + 5
            ) // 10


def test_line_counts_within_format_caps():
    c = corpus_pandas(60)
    docs = c["expected_documents"]
    lines = c["expected_lines"].groupby("doc_id").size()
    caps = {"abc": 17, "oscorp": 5, "nouryon": 14}
    for _, d in docs.iterrows():
        assert 1 <= lines[d["doc_id"]] <= caps[d["document_format"]]


def test_span_order_and_offsets():
    c = corpus_pandas(10)
    for _, r in c["documents"].iterrows():
        offs = [s["offset"] for s in r["spans"]]
        assert offs == list(range(len(offs)))
    for _, r in c["expected_spans"].iterrows():
        kinds = {s["kind"] for s in r["spans_out"]}
        assert kinds <= {"content", "boilerplate", "form-field"}


def test_media_refs_resolve_to_ocr_lines():
    c = corpus_pandas(5)
    words = c["ocr_words"]
    keys = {(d, l) for d, l in zip(words["doc_id"], words["line_id"])}
    for _, r in c["documents"].iterrows():
        for s in r["spans"]:
            if s["kind"] == "media":
                did, rest = s["media_ref"].split("#p")
                page, line = rest.split("L")
                assert (did, int(line)) in keys


def test_fields_ground_truth_complete():
    c = corpus_pandas(20)
    lines = c["expected_lines"].groupby("doc_id").size()
    for _, r in c["fields_map"].iterrows():
        f = r["fields"]
        for k in ["Inv", "TaxDate", "AccountNo", "PostCode", "Total", "VAT",
                  "Shipping", "TotalIncVAT"]:
            assert k in f, k
        n = lines[r["doc_id"]]
        for i in range(1, n + 1):
            for p in ["Drug", "Qty", "Unit", "Disc", "Net"]:
                assert f"{p}{i:02d}" in f
        assert f"Drug{n + 1:02d}" not in f
