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


# ---------------------------------------------------------------------------
# JsonXPath dialect (extraction_strategy.py:1851-1914)
# ---------------------------------------------------------------------------

XPATH_SCHEMA = {
    "name": "products",
    "baseSelector": "//div[@class='product']",
    "baseFields": [
        {"name": "sku", "type": "attribute", "attribute": "data-sku"},
    ],
    "fields": [
        {"name": "title", "type": "text", "selector": ".//h2[@class='name']"},
        {"name": "price", "type": "regex", "selector": ".//span[@class='price']",
         "pattern": r"\$([\d.]+)"},
        {"name": "link", "type": "attribute", "selector": ".//a", "attribute": "href"},
        {"name": "tags", "type": "list", "selector": ".//ul[@class='tags']/li",
         "fields": [{"name": "tag", "type": "text"}]},
        {"name": "missing", "type": "text", "selector": ".//nope", "default": "none"},
    ],
}


def test_json_xpath_pure_python():
    from crawl4ai_spark.operators.extraction import extract_json_xpath

    items = extract_json_xpath(HTML, XPATH_SCHEMA)
    assert len(items) == 2
    assert items[0]["sku"] == "sku1"
    # lxml text semantics: "".join(.//text()).strip() keeps interior
    # whitespace — "Widget " + "One" → "Widget One", NOT BS4's "WidgetOne"
    assert items[0]["title"] == "Widget One"
    assert items[0]["price"] == "9.99"
    assert items[0]["link"] == "/p/1"
    assert items[0]["tags"] == [{"tag": "a"}, {"tag": "b"}]
    assert items[0]["missing"] == "none"
    assert items[1]["sku"] == "sku2" and items[1]["tags"] == [{"tag": "c"}]


def test_json_xpath_css_fallback_conversion():
    """Field selectors without '/' go through _basic_css_to_xpath
    (extraction_strategy.py:1893-1901): bare tags work, 'a > b' and
    'a b' chains work, and a CSS class selector ('span.price') becomes
    invalid XPath → field default (the reference's XPathEvalError path)."""
    from crawl4ai_spark.operators.extraction import extract_json_xpath

    schema = {
        "name": "x",
        "baseSelector": "//div[@class='product']",
        "fields": [
            {"name": "link", "type": "attribute", "selector": "a", "attribute": "href"},
            {"name": "tag1", "type": "text", "selector": "ul > li"},
            {"name": "tagd", "type": "text", "selector": "ul li"},
            {"name": "lossy", "type": "text", "selector": "span.price", "default": "D"},
        ],
    }
    items = extract_json_xpath(HTML, schema)
    assert items[0]["link"] == "/p/1"
    assert items[0]["tag1"] == "a" and items[0]["tagd"] == "a"
    assert items[0]["lossy"] == "D"


def test_xpath_positional_predicate_per_parent():
    from crawl4ai_spark.functions.dom import parse_dom, xpath_select, xpath_text

    root = parse_dom(
        "<div><ul><li>one</li><li>two</li></ul><ul><li>three</li></ul></div>"
    )
    # //li[1] = first li-child of EACH parent (formal descendant-or-self
    # expansion), not the first of the flattened result set
    assert [xpath_text(n) for n in xpath_select(root, "//li[1]")] == ["one", "three"]
    assert [xpath_text(n) for n in xpath_select(root, "//li[2]")] == ["two"]
    # sequential predicates: position applies AFTER the attr filter
    root2 = parse_dom(
        '<ul><li>skip</li><li class="k">x</li><li class="k">y</li></ul>'
    )
    got = [xpath_text(n) for n in xpath_select(root2, "//li[@class='k'][2]")]
    assert got == ["y"]


def test_xpath_unsupported_raises():
    from crawl4ai_spark.functions.dom import parse_dom, xpath_select

    root = parse_dom("<div><a href='x'>t</a></div>")
    for bad in ["//a|//b", "//ancestor::a", "//a[last()]", "//span.price",
                "//a[@href^='x']", "//a[position()=1]"]:
        with pytest.raises(ValueError):
            xpath_select(root, bad)


def test_json_xpath_spark_operator_matches_css(spark):
    """Both dialects over the entry's card corpus extract identical
    items (the oracle-parity claim behind json_xpath_items)."""
    from crawl4ai_spark.operators.extraction import json_xpath_extract

    html = (
        '<html><body><div class="product" data-sku="sku1">'
        '<h2 class="name">N1</h2><span class="price">$9.99</span>'
        '<a href="/p/1">view</a></div></body></html>'
    )
    pages = spark.createDataFrame([("u1", html)], "url string, html string")
    xp_schema = {
        "name": "cards",
        "baseSelector": "//div[@class='product']",
        "baseFields": [{"name": "sku", "type": "attribute", "attribute": "data-sku"}],
        "fields": [
            {"name": "title", "type": "text", "selector": ".//h2[@class='name']"},
            {"name": "price", "type": "regex", "selector": ".//span[@class='price']",
             "pattern": r"\$([\d.]+)"},
            {"name": "link", "type": "attribute", "selector": ".//a", "attribute": "href"},
        ],
    }
    css_schema = {
        "name": "cards",
        "baseSelector": "div.product",
        "baseFields": [{"name": "sku", "type": "attribute", "attribute": "data-sku"}],
        "fields": [
            {"name": "title", "type": "text", "selector": "h2.name"},
            {"name": "price", "type": "regex", "selector": "span.price", "pattern": r"\$([\d.]+)"},
            {"name": "link", "type": "attribute", "selector": "a", "attribute": "href"},
        ],
    }
    xp = json_xpath_extract(pages, xp_schema).orderBy("item_idx").collect()
    cs = json_css_extract(pages, css_schema).orderBy("item_idx").collect()
    assert [r["item_json"] for r in xp] == [r["item_json"] for r in cs]
