"""Inline fixtures shared by queries() and their DuckDB oracles.

These cover operator semantics the driver star-schema tables can't
express (nullable required fields, Rupiah/percent literals, golden HTML
pages per FIXTURES.md §A). Each fixture exists ONCE here and is rendered
both as a Spark DataFrame and as a SQL VALUES clause so the two engines
see byte-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import local_df

# --- scalar parsing cases (FIXTURES.md §A4; literals match the forms the
# reference handles at scrap_tokopedia.py:256,262) ---------------------------
RUPIAH_CASES: list[tuple[int, str | None]] = [
    (1, "Rp12.345"),
    (2, "Rp1.000.000"),
    (3, " Rp500 "),
    (4, "Rp0"),
    (5, "Rp7"),
    (6, "not-a-price"),   # reference: int() raises -> row dropped; engine: NULL
    (7, None),
]

PERCENT_CASES: list[tuple[int, str | None]] = [
    (1, "5%"),
    (2, "15%"),
    (3, "100%"),
    (4, " 7% "),
    (5, "0%"),
    (6, None),
]

# --- page emptiness fixture (P4, scrap_tokopedia.py:211-229) ----------------
# (page_id, name, price): page empty iff name IS NULL OR price IS NULL
EMPTY_PAGE_CASES: list[tuple[int, str | None, int | None]] = [
    (1, "product-a", 10000),
    (2, None, 5000),
    (3, "product-c", None),
    (4, None, None),
    (5, "product-e", 50000),
]

# --- catalog cards fixture (P2/P3, scrap_tokopedia.py:197-204) ---------------
# (card_id, href, has_shadow): project href of cards without shadow marker
CARD_CASES: list[tuple[int, str, bool]] = [
    (1, "shop-a/item-1", False),
    (2, "shop-a/item-2", True),
    (3, "shop-b/item-3", False),
    (4, "shop-b/item-4", False),
    (5, "shop-c/item-5", True),
]

# --- price bands for the range/theta join (J6) -------------------------------
PRICE_BANDS: list[tuple[str, float, float]] = [
    ("budget", 0.0, 500.0),
    ("mid", 500.0, 1200.0),
    ("premium", 1200.0, 10_000_000.0),
]


def values_sql(rows: list[tuple], columns: list[str],
               casts: dict[str, str] | None = None) -> str:
    """Render rows as a DuckDB ``(VALUES ...) AS t(cols)`` subquery with
    NULL-safe literals; ``casts`` forces column types on the first row
    (DuckDB infers VALUES types from it)."""
    casts = casts or {}

    def lit(v, col):
        if v is None:
            base = "NULL"
        elif isinstance(v, bool):
            base = "true" if v else "false"
        elif isinstance(v, str):
            base = "'" + v.replace("'", "''") + "'"
        else:
            base = repr(v)
        if col in casts:
            return f"CAST({base} AS {casts[col]})"
        return base

    rendered = ",\n    ".join(
        "(" + ", ".join(lit(v, c) for v, c in zip(row, columns)) + ")"
        for row in rows)
    return f"(VALUES\n    {rendered}\n) AS t({', '.join(columns)})"


def spark_fixture(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    return local_df(spark, rows, schema)


# --- golden HTML pages (FIXTURES.md §A2/A3), built against the selector
# shapes in sources/extraction.py DEFAULT_SPEC --------------------------------

def _card(href: str, shadow: bool) -> str:
    inner = '<div data-testid="imgProductShadow"></div>' if shadow else ""
    return f'<a data-testid="lnkProductContainer" href="{href}">{inner}<span>x</span></a>'


def catalog_html(links: list[tuple[str, bool]], empty_state: bool = False,
                 next_button: bool = True) -> str:
    body = "".join(_card(h, s) for h, s in links)
    if empty_state:
        body += '<div data-testid="divProductEmptyState">No products</div>'
    if next_button:
        body += '<a data-testid="btnShopProductPageNext">Next</a>'
    return f"<html><body><div id='zeus-root'>{body}</div></body></html>"


def product_html(name: str | None, price: str | None, detail: str | None = None,
                 originalprice: str | None = None, discount: str | None = None) -> str:
    parts = []
    if name is not None:
        parts.append(f'<h1 data-testid="lblPDPDetailProductName"> {name} </h1>')
    if price is not None:
        parts.append(f'<div data-testid="lblPDPDetailProductPrice">{price}</div>')
    if detail is not None:
        parts.append(f'<div data-testid="lblPDPDescriptionProduk">{detail}</div>')
    if originalprice is not None:
        parts.append(f'<span data-testid="lblPDPDetailOriginalPrice">{originalprice}</span>')
    if discount is not None:
        parts.append(f'<span data-testid="lblPDPDetailDiscountPercentage">{discount}</span>')
    return f"<html><body>{''.join(parts)}</body></html>"


# --- one-shop scrape-pipeline fixture (SURVEY.md §3.1): 2 catalog pages,
# one shadow card (anti-filtered), one product missing price (quarantined).
# Used by the scrape_pipeline end-to-end query; expected rows are the
# oracle side. ---------------------------------------------------------------

SHOP_BASE = "https://www.tokopedia.com/shopx"


def shop_pipeline_pages() -> dict[str, str]:
    return {
        SHOP_BASE: catalog_html([("shopx/p1", False), ("shopx/p2", True)]),
        f"{SHOP_BASE}/page/2": catalog_html([("shopx/p3", False),
                                             ("shopx/p4", False)]),
        "https://www.tokopedia.com/shopx/p1":
            product_html("Item One", "Rp10.000", "first", "Rp12.500", "20%"),
        "https://www.tokopedia.com/shopx/p3":
            product_html("Item Three", "Rp30.000"),
        "https://www.tokopedia.com/shopx/p4":
            product_html("Item Four", None),          # missing price -> drop
    }


# (name, detail, price, originalprice, discountpercentage, platform)
SHOP_PIPELINE_EXPECTED: list[tuple] = [
    ("Item One", "first", 10000, 12500, 0.20, "tokopedia"),
    ("Item Three", None, 30000, None, None, "tokopedia"),
]


# (url, html, expected (name, detail, price, originalprice, discountpercentage)
#  or None when the row must be quarantined)
PRODUCT_PAGE_CASES: list[tuple[str, str, tuple | None]] = [
    ("u1", product_html("Soap Bar", "Rp12.345", "Gentle soap", "Rp15.000", "18%"),
     ("Soap Bar", "Gentle soap", 12345, 15000, 0.18)),
    ("u2", product_html("Shampoo", "Rp25.000"),
     ("Shampoo", None, 25000, None, None)),
    ("u3", product_html("Tea 5%", "Rp1.000.000", None, "Rp1.250.000", "20%"),
     ("Tea 5%", None, 1000000, 1250000, 0.20)),
    ("u4", product_html(None, "Rp9.999"), None),          # missing name -> drop
    ("u5", product_html("Lotion", None), None),           # missing price -> drop
    ("u6", product_html("Det<b>er</b>gent", "Rp50.000", "Big &amp; clean"),
     ("Detergent", "Big & clean", 50000, None, None)),
]
