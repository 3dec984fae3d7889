"""Amazon product-card crawler graft — contract surfaces cross-checked
against the reference files themselves (no hand-copied expectations)."""

import ast
import json

REF_CRAWLER = "/root/reference/crawl4ai/crawlers/amazon_product/crawler.py"
REF_EXAMPLE = "/root/reference/docs/examples/amazon_product_extraction_direct_url.py"


def _ref_ast(path):
    with open(path) as fh:
        return ast.parse(fh.read())


def test_meta_and_stub_match_reference_file():
    """AMAZON_META and the canned run() payload are transcriptions —
    assert them equal to the literals in the reference source."""
    from crawl4ai_spark.operators.amazon import (
        AMAZON_META,
        AMAZON_STUB_RESULT,
        amazon_run_stub,
    )

    tree = _ref_ast(REF_CRAWLER)
    metas = [
        ast.literal_eval(n.value)
        for n in ast.walk(tree)
        if isinstance(n, ast.Assign)
        and any(isinstance(t, ast.Name) and t.id == "__meta__" for t in n.targets)
    ]
    assert metas == [AMAZON_META]
    returned = [
        n.value.value
        for n in ast.walk(tree)
        if isinstance(n, ast.Return) and isinstance(n.value, ast.Constant)
    ]
    assert returned == [AMAZON_STUB_RESULT]
    assert amazon_run_stub("https://www.amazon.com/dp/X") == AMAZON_STUB_RESULT
    # the stub's payload honors its own declared schema keys
    assert set(json.loads(AMAZON_STUB_RESULT)) <= set(AMAZON_META["schema"])


def test_schema_matches_reference_example_verbatim():
    """The product-card schema bundle is the docs example's literal
    (docs/examples/amazon_product_extraction_direct_url.py:20-76)."""
    from crawl4ai_spark.operators.amazon import AMAZON_PRODUCT_SCHEMA

    tree = _ref_ast(REF_EXAMPLE)
    schemas = [
        ast.literal_eval(kw.value)
        for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        for kw in n.keywords
        if kw.arg == "schema"
    ]
    assert schemas == [AMAZON_PRODUCT_SCHEMA]


def test_extraction_quirks_pinned():
    """Reference-core parity quirks on a fixture page: empty-selector
    asin and 'exists' sponsored fall to default (absent), 'multiple'
    delivery_info returns the FIRST match's text, reviews_count rides
    the general-sibling combinator."""
    from crawl4ai_spark.operators.amazon import AMAZON_PRODUCT_SCHEMA
    from crawl4ai_spark.operators.extraction import extract_json_css

    html = (
        '<div data-component-type="s-search-result" data-asin="B000X">'
        '<h2><a href="/dp/B000X"><span>Thing</span></a></h2>'
        '<img class="s-image" src="https://img.test/x.jpg">'
        '<span class="a-icon-star-small"><span class="a-icon-alt">4.0 out of 5 stars</span></span>'
        '<span data-csa-c-func-deps="aui-da-a-popover">r</span><span><span>321</span></span>'
        '<span class="a-price"><span class="a-offscreen">$19.49</span></span>'
        '<span class="a-price a-text-price"><span class="a-offscreen">$29.99</span></span>'
        '<span class="puis-sponsored-label-text">Sponsored</span>'
        '<div data-cy="delivery-recipe"><span class="a-color-base">Get it Mon</span>'
        '<span class="a-color-base">or Tue</span></div>'
        "</div>"
    )
    items = extract_json_css(html, AMAZON_PRODUCT_SCHEMA)
    assert len(items) == 1
    item = items[0]
    assert "asin" not in item  # empty selector → default (reference parity)
    assert "sponsored" not in item  # 'exists' type unimplemented in the core
    assert item["delivery_info"] == "Get it Mon"  # 'multiple' ignored: first match
    assert item["reviews_count"] == "321"  # ~ sibling chain
    assert item["price"] == "$19.49"
    assert item["original_price"] == "$29.99"
    assert item["title"] == "Thing"
    assert item["url"] == "/dp/B000X"
    assert item["image"] == "https://img.test/x.jpg"
    assert item["rating"] == "4.0 out of 5 stars"


def test_sibling_combinators():
    """The ``~`` / ``+`` combinators added for the amazon schema, plus
    bracket-awareness (combinator chars inside attribute values)."""
    from crawl4ai_spark.functions.dom import css_select, parse_dom

    root = parse_dom(
        "<div><i id='a'>1</i><b>2</b><i id='b'>3</i><u>4</u>"
        '<a data-x="a > b ~ c">5</a><em>6</em></div>'
    )
    assert [n.attrs.get("id") for n in css_select(root, "b ~ i")] == ["b"]
    assert [n.tag for n in css_select(root, "i + b")] == ["b"]
    assert css_select(root, "u + i") == []
    assert [n.tag for n in css_select(root, "i ~ u")] == ["u"]
    assert [n.tag for n in css_select(root, "[data-x='a > b ~ c'] + em")] == ["em"]


def test_build_amazon_schema_caches():
    from crawl4ai_spark.operators.amazon import AMAZON_PRODUCT_SCHEMA, build_amazon_schema

    cache = {}
    s1 = build_amazon_schema(cache)
    s2 = build_amazon_schema(cache)
    assert s1 is s2 is cache["amazon_product_schema"]
    assert s1 == AMAZON_PRODUCT_SCHEMA
