"""Field-key constants — parity with reference Horus.Functions/Models/HorusConstants.cs:9-25
and BaseConstants.cs:9 (MAX_DOCUMENT_LINES)."""

TAX_DATE = "TaxDate"
ORDER_NUMBER = "OrderNO"
ORDER_DATE = "OrderDate"
INVOICE_NUMBER = "Inv"
ACCOUNT = "AccountNo"
SHIPPING_TOTAL = "Shipping"
VAT_AMOUNT = "VAT"
NET_TOTAL = "Total"
GRAND_TOTAL = "TotalIncVAT"
POST_CODE = "PostCode"

LINE_ITEM_PREFIX = "Drug"
QUANTITY_PREFIX = "Qty"
UNIT_PRICE_PREFIX = "Unit"
NET_PRICE_PREFIX = "Net"
VAT_CODE_PREFIX = "Vat"
DISCOUNT_PERCENT_PREFIX = "Disc"
TAXABLE_PREFIX = "Taxable"

MAX_DOCUMENT_LINES = 50  # loop runs 1..49 inclusive

ALLOWED_CONTENT_TYPES = [
    "application/pdf",
    "image/jpeg",
    "image/png",
    "image/tiff",
]  # reference Horus.Functions/Models/BaseConstants.cs:10
