"""Document shredder — fields map -> typed document + line items + error rows.

Re-expresses the reference's shredding semantics
(reference Horus.Functions/Engines/Processing/HorusProcessingEngine.cs:13-90
and ProcessingEngine.cs:15-130) as PURE Spark SQL expressions — higher-order
functions over the fields map, fully inside whole-stage codegen, zero Python.

Parity points preserved exactly:
- quote sanitization '\'' -> '@Illegal@' (ProcessingEngine.cs:37-40)
- PRE0001..PRE0007 error rows, severities, message text and ORDER of
  emission: header fields in extraction order (HorusProcessingEngine.cs:28-37:
  OrderNO, OrderDate, TaxDate, Inv, AccountNo, Total, VAT, Shipping,
  TotalIncVAT, PostCode), then per line: Drug logged at Warning then read at
  Terminal (the reference calls GetString twice — log.LogTrace at
  HorusProcessingEngine.cs:65 — so a missing Drug yields TWO PRE0001 rows),
  Qty, Net(Terminal), Unit(Terminal), Vat, Disc, Taxable.
- prefix-termination line scan: line i exists iff any of Unit{i:02d},
  Net{i:02d}, Drug{i:02d} is present as a key; the scan BREAKS at the first
  absent line (max 49) — later lines are invisible even if present
  (HorusProcessingEngine.cs:49-85, ProcessingEngine.cs:15-35).
- LineQuantity is a STRING: the decimal-normalized text if parseable else ''
  (C# Nullable<decimal>.ToString(); HorusProcessingEngine.cs:69).
- numeric coalesce `?? 0` for NetAmount/UnitPrice/DiscountPercent and header
  totals; PRE0004 zero-value warning is always Warning severity.
- TaxPeriod = year + month with NO zero padding: Jan 2020 -> '20201'
  (HorusProcessingEngine.cs:42-45).
- CalculatedLineQuantity = NetAmount/UnitPrice when both nonzero else 0
  (Models/DocumentLineItem.cs:18-26).
- IsValid / error counts (Models/Document.cs:42-57).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from horus_spark import constants as C
from horus_spark import errors as E

# C#-Decimal.TryParse-compatible numeric shape after space stripping;
# allows thousands commas (stripped before cast).
_NUM_RE = r"^[+-]?([0-9][0-9,]*\.?[0-9]*|\.[0-9]+)$"


def _err(code: str, severity: str, message: Column) -> Column:
    return F.struct(
        F.lit(code).alias("code"),
        F.lit(severity).alias("severity"),
        message.alias("message"),
    )


def _sanitize(col: Column) -> Column:
    return F.regexp_replace(col, "'", E.ILLEGAL_MARKER)


class _FieldOps:
    """Expression builders over a fields map column (key -> text)."""

    def __init__(self, fields: Column):
        self.fields = fields
        self.keys = F.map_keys(fields)

    def has(self, key: Column) -> Column:
        return F.array_contains(self.keys, key)

    def raw(self, key: Column) -> Column:
        return F.element_at(self.fields, key)

    # --- GetString (ProcessingEngine.cs:41-59) ---
    def str_value(self, key: Column) -> Column:
        return F.when(self.has(key) & self.raw(key).isNotNull(), _sanitize(self.raw(key)))

    def str_error(self, key: Column, severity: str) -> Column:
        return F.when(
            ~self.has(key) | self.raw(key).isNull(),
            _err(
                E.CODE_STRING_NULL,
                severity,
                F.concat(F.lit("GetString() Specified Element "), key, F.lit(" is null")),
            ),
        )

    # --- GetNumber (ProcessingEngine.cs:61-101) ---
    def _num_cleaned(self, key: Column) -> Column:
        return F.regexp_replace(F.trim(self.raw(key)), " ", "")

    def num_parse_ok(self, key: Column) -> Column:
        return self._num_cleaned(key).rlike(_NUM_RE)

    def num_value(self, key: Column) -> Column:
        """Parsed value or NULL (caller applies `?? 0` where the reference does)."""
        return F.when(
            self.has(key) & self.raw(key).isNotNull() & self.num_parse_ok(key),
            F.regexp_replace(self._num_cleaned(key), ",", "").cast("double"),
        )

    def num_normalized_string(self, key: Column) -> Column:
        """C# decimal round-trip string of the parsed value ('' when null)."""
        cleaned = F.regexp_replace(self._num_cleaned(key), ",", "")
        # strip leading zeros ('05'->'5') and leading '.'->'0.', like
        # Decimal.Parse().ToString(); generated corpora never hit the edges.
        norm = F.regexp_replace(cleaned, r"^([+-]?)0+([0-9])", r"$1$2")
        norm = F.regexp_replace(norm, r"^([+-]?)\.", r"$10.")
        return F.when(self.num_value(key).isNotNull(), norm).otherwise(F.lit(""))

    def num_error(self, key: Column, severity: str) -> Column:
        missing = ~self.has(key) | self.raw(key).isNull()
        return (
            F.when(
                missing,
                _err(
                    E.CODE_NUMBER_NULL,
                    severity,
                    F.concat(F.lit("GetNumber() Specified Element "), key, F.lit(" is null")),
                ),
            )
            .when(
                ~self.num_parse_ok(key),
                _err(
                    E.CODE_NUMBER_PARSE,
                    severity,
                    _sanitize(
                        F.concat(
                            F.lit("GetNumber() "),
                            key,
                            F.lit(" exists but cannot be parsed as a number="),
                            self.raw(key),
                        )
                    ),
                ),
            )
            .when(
                self.num_value(key) == 0,
                _err(
                    E.CODE_NUMBER_ZERO,
                    E.SEV_WARNING,  # zero warning is ALWAYS Warning severity
                    F.concat(F.lit("GetNumber() "), key, F.lit(" exists but its value is zero")),
                ),
            )
        )

    # --- GetDate (ProcessingEngine.cs:103-130) ---
    def date_value(self, key: Column) -> Column:
        raw = F.trim(self.raw(key))
        return F.coalesce(
            F.try_to_timestamp(raw, F.lit("dd/MM/yyyy")),
            F.try_to_timestamp(raw, F.lit("dd/MM/yyyy HH:mm:ss")),  # dmy per fields.json
            F.try_to_timestamp(raw, F.lit("M/d/yyyy h:mm:ss a")),
            F.try_to_timestamp(raw, F.lit("M/d/yyyy H:mm:ss")),
            F.try_to_timestamp(raw, F.lit("yyyy-MM-dd HH:mm:ss")),
            F.try_to_timestamp(raw, F.lit("yyyy-MM-dd")),
            F.try_to_timestamp(raw),
        )

    def date_error(self, key: Column, severity: str) -> Column:
        missing = ~self.has(key) | self.raw(key).isNull()
        return F.when(
            missing,
            _err(
                E.CODE_DATE_NULL,
                severity,
                F.concat(F.lit("GetDate() Specified Element "), key, F.lit(" is null")),
            ),
        ).when(
            self.date_value(key).isNull(),
            _err(
                E.CODE_DATE_PARSE,
                severity,
                _sanitize(
                    F.concat(
                        F.lit("GetDate() Specified Element "),
                        key,
                        F.lit(" does not contain a valid date: TaxDate="),
                        self.raw(key),
                    )
                ),
            ),
        )


def _k(prefix: str, i: Column) -> Column:
    """'{prefix}{i:02d}' line-field key (HorusProcessingEngine.cs:51-58)."""
    return F.concat(F.lit(prefix), F.lpad(i.cast("string"), 2, "0"))


def shred(df: DataFrame, fields_col: str = "fields", carry: list[str] | None = None) -> DataFrame:
    """Shred (doc_id, fields:map<string,string>[, thumbprint, model_id,
    model_version]) into the EXTRACTED document shape; `carry` columns are
    appended to the output unchanged (e.g. spans_out).

    Pure Spark expressions — no UDFs; survives whole-stage codegen.
    """
    fo = _FieldOps(F.col(fields_col))
    cols = df.columns

    def lit_k(k: str) -> Column:
        return F.lit(k)

    # ---- header scalars
    order_number = fo.str_value(lit_k(C.ORDER_NUMBER))
    order_date = fo.date_value(lit_k(C.ORDER_DATE))
    tax_date = fo.date_value(lit_k(C.TAX_DATE))
    document_number = fo.str_value(lit_k(C.INVOICE_NUMBER))
    account = fo.str_value(lit_k(C.ACCOUNT))
    net_total = F.coalesce(fo.num_value(lit_k(C.NET_TOTAL)), F.lit(0.0))
    vat_amount = F.coalesce(fo.num_value(lit_k(C.VAT_AMOUNT)), F.lit(0.0))
    shipping_total = F.coalesce(fo.num_value(lit_k(C.SHIPPING_TOTAL)), F.lit(0.0))
    grand_total = F.coalesce(fo.num_value(lit_k(C.GRAND_TOTAL)), F.lit(0.0))
    post_code = fo.str_value(lit_k(C.POST_CODE))
    tax_period = F.when(
        tax_date.isNotNull(),
        F.concat(F.year(tax_date).cast("string"), F.month(tax_date).cast("string")),
    )

    # ---- header errors, in extraction order
    header_errors = F.array(
        fo.str_error(lit_k(C.ORDER_NUMBER), E.SEV_WARNING),
        fo.date_error(lit_k(C.ORDER_DATE), E.SEV_WARNING),
        fo.date_error(lit_k(C.TAX_DATE), E.SEV_WARNING),
        fo.str_error(lit_k(C.INVOICE_NUMBER), E.SEV_WARNING),
        fo.str_error(lit_k(C.ACCOUNT), E.SEV_WARNING),
        fo.num_error(lit_k(C.NET_TOTAL), E.SEV_WARNING),
        fo.num_error(lit_k(C.VAT_AMOUNT), E.SEV_WARNING),
        fo.num_error(lit_k(C.SHIPPING_TOTAL), E.SEV_WARNING),
        fo.num_error(lit_k(C.GRAND_TOTAL), E.SEV_WARNING),
        fo.str_error(lit_k(C.POST_CODE), E.SEV_WARNING),
    )

    # ---- prefix-terminated line count: line i present iff any of
    # Unit/Net/Drug key exists; acc tracks the longest 1..i prefix present.
    def present(i: Column) -> Column:
        return (
            fo.has(_k(C.UNIT_PRICE_PREFIX, i))
            | fo.has(_k(C.NET_PRICE_PREFIX, i))
            | fo.has(_k(C.LINE_ITEM_PREFIX, i))
        )

    n_lines = F.aggregate(
        F.sequence(F.lit(1), F.lit(C.MAX_DOCUMENT_LINES - 1)),
        F.lit(0),
        lambda acc, i: F.when((acc == i - 1) & present(i), i).otherwise(acc),
    )

    def line_struct(i: Column) -> Column:
        net = F.coalesce(fo.num_value(_k(C.NET_PRICE_PREFIX, i)), F.lit(0.0))
        unit = F.coalesce(fo.num_value(_k(C.UNIT_PRICE_PREFIX, i)), F.lit(0.0))
        return F.struct(
            F.lpad(i.cast("string"), 2, "0").alias("line_no"),
            fo.str_value(_k(C.LINE_ITEM_PREFIX, i)).alias("item_description"),
            fo.num_normalized_string(_k(C.QUANTITY_PREFIX, i)).alias("line_quantity"),
            unit.alias("unit_price"),
            fo.str_value(_k(C.VAT_CODE_PREFIX, i)).alias("vat_code"),
            fo.str_value(_k(C.TAXABLE_PREFIX, i)).alias("taxable_indicator"),
            net.alias("net_amount"),
            F.when((net != 0) & (unit != 0), net / unit)
            .otherwise(F.lit(0.0))
            .alias("calculated_line_quantity"),
            F.coalesce(fo.num_value(_k(C.DISCOUNT_PERCENT_PREFIX, i)), F.lit(0.0)).alias(
                "discount_percent"
            ),
        )

    def line_errors(i: Column) -> Column:
        return F.array(
            fo.str_error(_k(C.LINE_ITEM_PREFIX, i), E.SEV_WARNING),  # LogTrace call
            fo.str_error(_k(C.LINE_ITEM_PREFIX, i), E.SEV_TERMINAL),
            fo.num_error(_k(C.QUANTITY_PREFIX, i), E.SEV_WARNING),
            fo.num_error(_k(C.NET_PRICE_PREFIX, i), E.SEV_TERMINAL),
            fo.num_error(_k(C.UNIT_PRICE_PREFIX, i), E.SEV_TERMINAL),
            fo.str_error(_k(C.VAT_CODE_PREFIX, i), E.SEV_WARNING),
            fo.num_error(_k(C.DISCOUNT_PERCENT_PREFIX, i), E.SEV_WARNING),
            fo.str_error(_k(C.TAXABLE_PREFIX, i), E.SEV_WARNING),
        )

    line_seq = F.sequence(F.lit(1), n_lines)
    line_items = F.when(n_lines > 0, F.transform(line_seq, line_struct)).otherwise(
        F.array().cast("array<struct<line_no:string,item_description:string,"
                       "line_quantity:string,unit_price:double,vat_code:string,"
                       "taxable_indicator:string,net_amount:double,"
                       "calculated_line_quantity:double,discount_percent:double>>")
    )
    all_errors = F.filter(
        F.concat(
            header_errors,
            F.when(n_lines > 0, F.flatten(F.transform(line_seq, line_errors))).otherwise(
                F.array().cast(
                    "array<struct<code:string,severity:string,message:string>>"
                )
            ),
        ),
        lambda e: e.isNotNull(),
    )

    terminal_count = F.size(F.filter(all_errors, lambda e: e["severity"] == E.SEV_TERMINAL))
    warning_count = F.size(F.filter(all_errors, lambda e: e["severity"] == E.SEV_WARNING))

    out = (
        df.withColumn("_line_items", line_items)
        .withColumn("_errors", all_errors)
        .select(
            F.col("doc_id"),
            (F.col("file_name") if "file_name" in cols else F.col("doc_id")).alias("file_name"),
            document_number.alias("document_number"),
            order_number.alias("order_number"),
            order_date.alias("order_date"),
            tax_date.alias("tax_date"),
            tax_period.alias("tax_period"),
            account.alias("account"),
            post_code.alias("post_code"),
            net_total.alias("net_total"),
            vat_amount.alias("vat_amount"),
            shipping_total.alias("shipping_total"),
            grand_total.alias("grand_total"),
            (F.col("thumbprint") if "thumbprint" in cols else F.lit(None).cast("string")).alias(
                "thumbprint"
            ),
            (F.col("model_id") if "model_id" in cols else F.lit(None).cast("string")).alias(
                "model_id"
            ),
            (
                F.col("model_version") if "model_version" in cols else F.lit(None).cast("string")
            ).alias("model_version"),
            terminal_count.alias("terminal_error_count"),
            warning_count.alias("warning_error_count"),
            (terminal_count == 0).alias("is_valid"),
            F.col("_line_items").alias("line_items"),
            F.col("_errors").alias("errors"),
            F.lit(0).cast("long").alias("time_to_shred_ms"),
            *[F.col(c) for c in (carry or [])],
        )
    )
    return out


def fields_struct_to_text_map(fields_col: Column) -> Column:
    """Adapter: map<string, struct<text,...>> -> map<string,string>."""
    return F.transform_values(fields_col, lambda _, v: v["text"])
