"""Structured extraction: regex catalog (JVM + span-parity paths) and
JSON-CSS schema extraction on the stdlib DOM."""

import json

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.dom import css_select, parse_dom
from crawl4ai_spark.operators.extraction import (
    DEFAULT_PATTERNS,
    extract_json_css,
    json_css_extract,
    regex_extract,
    regex_extract_spans,
)

TEXT = (
    "Contact john.doe+x@example.com or visit https://site.example.com/a?b=1 "
    "on 2024-03-15; price was $12.50 (up 3.5%) from 10/02/23. "
    "Color #AaBbCc and handle @someone #tagged."
)


def _ref_matches(labels):
    """Matches per the reference's exact extract() (finditer, I|M flags)."""
    import re

    out = []
    for lbl in sorted(labels):
        cre = re.compile(DEFAULT_PATTERNS[lbl], re.IGNORECASE | re.MULTILINE)
        for m in cre.finditer(TEXT):
            out.append((lbl, m.group(0), m.start(), m.end()))
    return out


LABELS = ["email", "url", "date_iso", "currency", "percentage", "date_us", "html_color_hex"]


def test_regex_extract_spans_matches_reference_semantics(spark):
    pages = spark.createDataFrame([("u", TEXT)], "url string, text string")
    got = [
        (r["label"], r["value"], r["span_start"], r["span_end"])
        for r in regex_extract_spans(pages, LABELS).orderBy("label", "span_start").collect()
    ]
    assert got == sorted(_ref_matches(LABELS))


def test_regex_extract_jvm_path_same_values(spark):
    """The codegen'd regexp_extract_all path returns the same (label,
    value) multiset as the reference-flag Python path for the catalog."""
    pages = spark.createDataFrame([("u", TEXT)], "url string, text string")
    jvm = sorted(
        (r["label"], r["value"]) for r in regex_extract(pages, LABELS).collect()
    )
    ref = sorted((lbl, v) for lbl, v, _s, _e in _ref_matches(LABELS))
    assert jvm == ref


HTML = """
<html><body>
<div class="product" data-sku="sku1" id="p1">
  <h2 class="name">Widget <em>One</em></h2>
  <span class="price">$9.99</span>
  <a href="/p/1" title="t1">view</a>
  <ul class="tags"><li>a</li><li>b</li></ul>
</div>
<div class="product" data-sku="sku2">
  <h2 class="name">Gadget</h2>
  <span class="price">$19.50</span>
  <a href="/p/2">view</a>
  <ul class="tags"><li>c</li></ul>
</div>
<div class="not-product"><h2 class="name">nope</h2></div>
</body></html>
"""

SCHEMA = {
    "name": "products",
    "baseSelector": "div.product",
    "baseFields": [
        {"name": "sku", "type": "attribute", "attribute": "data-sku"},
    ],
    "fields": [
        {"name": "title", "type": "text", "selector": "h2.name"},
        {"name": "price", "type": "regex", "selector": "span.price", "pattern": r"\$([\d.]+)"},
        {"name": "link", "type": "attribute", "selector": "a", "attribute": "href"},
        {"name": "tags", "type": "list", "selector": "ul.tags li",
         "fields": [{"name": "tag", "type": "text"}]},
        {"name": "missing", "type": "text", "selector": ".nope", "default": "none"},
    ],
}


def test_json_css_pure_python():
    items = extract_json_css(HTML, SCHEMA)
    assert len(items) == 2
    assert items[0]["sku"] == "sku1"
    # BS4 get_text(strip=True) strips EACH string and joins with "" —
    # "Widget " + "One" → "WidgetOne" (reference behavior, pinned)
    assert items[0]["title"] == "WidgetOne"
    assert items[0]["price"] == "9.99"         # regex group(1)
    assert items[0]["link"] == "/p/1"
    assert items[0]["tags"] == [{"tag": "a"}, {"tag": "b"}]
    assert items[0]["missing"] == "none"       # default on selector miss
    assert items[1]["sku"] == "sku2" and items[1]["tags"] == [{"tag": "c"}]


def test_json_css_spark_operator(spark):
    pages = spark.createDataFrame([("u1", HTML), ("u2", "<p>no products</p>")],
                                  "url string, html string")
    rows = json_css_extract(pages, SCHEMA).orderBy("src_url", "item_idx").collect()
    assert [r["src_url"] for r in rows] == ["u1", "u1"]
    item0 = json.loads(rows[0]["item_json"])
    assert item0["title"] == "WidgetOne" and item0["sku"] == "sku1"


def test_css_selector_subset():
    root = parse_dom(HTML)
    assert len(css_select(root, "div.product")) == 2
    assert len(css_select(root, ".product, .not-product")) == 3
    assert [n.get_text(strip=True) for n in css_select(root, "#p1 ul.tags > li")] == ["a", "b"]
    assert css_select(root, "[data-sku='sku2']")[0].get("data-sku") == "sku2"
    assert css_select(root, "ul.tags li:nth-child(2)")[0].get_text() == "b"
    assert css_select(root, "div.product h2.name em")[0].get_text() == "One"


def test_transforms_and_nested():
    html = '<div class="x"><span class="a">  Mixed Case </span><div class="inner"><b class="v">z</b></div></div>'
    schema = {
        "baseSelector": "div.x",
        "fields": [
            {"name": "up", "type": "text", "selector": ".a", "transform": "uppercase"},
            {"name": "nested", "type": "nested", "selector": ".inner",
             "fields": [{"name": "v", "type": "text", "selector": ".v"}]},
        ],
    }
    items = extract_json_css(html, schema)
    assert items == [{"up": "MIXED CASE", "nested": {"v": "z"}}]


def test_css_select_scope_semantics():
    """soupsieve scoping: combinator ancestors may match the scope
    element itself (or beyond) — a nested field selector restating the
    base selector still extracts (code-review regression pin)."""
    root = parse_dom(HTML)
    base = css_select(root, "div.product")[0]
    assert [n.get_text() for n in css_select(base, "div.product > h2.name")] != []
    assert css_select(base, "div.product h2.name")[0].get_text(strip=True) == "WidgetOne"
    assert css_select(base, "body div.product a")[0].get("href") == "/p/1"
    # results stay scoped: the sibling product's nodes never leak in
    assert all("/p/2" != n.get("href") for n in css_select(base, "a"))


def test_json_css_nested_selector_restates_base():
    schema = {
        "baseSelector": "div.product",
        "fields": [
            {"name": "title", "type": "text", "selector": "div.product h2.name"},
        ],
    }
    items = extract_json_css(HTML, SCHEMA | schema)
    assert items[0]["title"] == "WidgetOne"


def test_transform_on_missing_attribute_collapses_list():
    """Reference quirk (:1163 + :1126-1146 try): transform applied
    unconditionally — a None value raises and the whole LIST field
    collapses to its default."""
    html = '<div class="x"><i class="t" data-v="A">1</i><i class="t">2</i></div>'
    schema = {
        "baseSelector": "div.x",
        "fields": [
            {"name": "vals", "type": "list", "selector": "i.t", "default": [],
             "fields": [{"name": "v", "type": "attribute", "attribute": "data-v",
                         "transform": "lowercase"}]},
        ],
    }
    items = extract_json_css(html, schema)
    assert items == [{"vals": []}]  # second item's missing attr kills the list
