"""Golden-fixture extraction tests (SURVEY.md §5.2): synthetic HTML
embedding the reference's selector shapes (scrap_tokopedia.py:30-73)
-> expected link lists, page stats, and product rows.
"""

from __future__ import annotations

from unilever_scraping_etl_spark.plans.fixtures import catalog_html, product_html
from unilever_scraping_etl_spark.sources import extraction as ex


def test_extract_links_skips_shadow_cards():
    html = catalog_html([("a/1", False), ("a/2", True), ("a/3", False)])
    assert ex.extract_links(html) == ["a/1", "a/3"]


def test_extract_links_empty_and_none():
    assert ex.extract_links(None) == []
    assert ex.extract_links("") == []
    assert ex.extract_links("<html><body>nothing</body></html>") == []


def test_page_stats_counts_valid_invalid():
    html = catalog_html([("a/1", False), ("a/2", True), ("a/3", False)])
    assert ex.page_stats(html) == (2, 1, True)


def test_page_stats_empty_state_short_circuits():
    # scrap_tokopedia.py:145-147 — empty-state marker beats any cards
    html = catalog_html([("a/1", False)], empty_state=True)
    assert ex.page_stats(html) == (0, 0, False)


def test_is_page_empty_requires_name_and_price():
    assert not ex.is_page_empty(product_html("X", "Rp1.000"))
    assert ex.is_page_empty(product_html(None, "Rp1.000"))
    assert ex.is_page_empty(product_html("X", None))
    assert ex.is_page_empty(None)


def test_extract_product_raw_fields_and_nulls():
    html = product_html("Soap", "Rp12.345", "desc", "Rp15.000", "18%")
    out = ex.extract_product_raw(html)
    assert out == {"name_raw": "Soap", "detail_raw": "desc",
                   "price_raw": "Rp12.345", "originalprice_raw": "Rp15.000",
                   "discount_raw": "18%"}
    partial = ex.extract_product_raw(product_html("Soap", None))
    assert partial["name_raw"] == "Soap"
    assert partial["price_raw"] is None


def test_get_text_document_order_and_entities():
    root = ex.parse_html("<div>Det<b>er</b>gent &amp; more</div>")
    node = ex.find(root, ex.Selector.of("div"))
    assert node.get_text(strip=True) == "Detergent & more"


def test_selector_class_token_matching():
    root = ex.parse_html('<div class="a b c">x</div>')
    assert ex.find(root, ex.Selector.of("div", class_="b")) is not None
    assert ex.find(root, ex.Selector.of("div", class_="z")) is None
