"""Schema-generation data-plane tests (reference: utils.py:3040-3263,
extraction_strategy.py:1277-1388).

lxml is absent from the container, so ``preprocess_html_for_schema`` /
``optimize_html`` are pinned rule-by-rule against hand-built expectations
(same precedent as the sentence chunker); the pure ``truncate`` helper IS
cross-executed against the reference's own extracted code.
"""

import json

import pytest

from reference_loader import load_defs

from crawl4ai_spark.operators.extraction import extract_json_css
from crawl4ai_spark.operators.schema_gen import (
    build_schema_prompt,
    generate_schema,
    generate_schemas,
    induce_css_schema,
    optimize_html,
    preprocess_html_for_schema,
    preprocess_pages,
    truncate,
)

CARDS = (
    '<div class="item card" data-sku="s1"><h3 class="title">Item A</h3>'
    '<span class="price">$1.00</span><a href="/a">view</a></div>'
    '<div class="item card" data-sku="s2"><h3 class="title">Item B</h3>'
    '<span class="price">$2.00</span><a href="/b">view</a></div>'
)
PAGE = (
    "<html><head><title>T</title><script>var x=1;</script></head><body>"
    '<script>junk()</script><style>.x{}</style>'
    '<nav class="topnav" onclick="evil()" style="color:red" data-k="v">menu</nav>'
    f'<p class="intro">{"long text " * 30}</p>{CARDS}</body></html>'
)


def test_truncate_xcheck():
    ref = load_defs("utils.py", ["truncate"])["truncate"]
    for v, t in [("abc", 5), ("abcdef", 5), ("", 3), ("x" * 200, 200), ("x" * 201, 200)]:
        assert truncate(v, t) == ref(v, t)


def test_preprocess_strips_head_scripts_styles():
    red = preprocess_html_for_schema(PAGE)
    assert "<head>" not in red and "<script" not in red and "<style" not in red
    assert "<title>" not in red


def test_preprocess_prunes_attributes():
    red = preprocess_html_for_schema(PAGE)
    assert "onclick" not in red and "style=" not in red
    assert 'data-k="v"' in red  # data-* kept
    assert 'class="topnav"' in red  # class kept


def test_preprocess_keeps_href_out():
    # attribs_to_keep is the aggressive set {id,class,name,type,value}+data-*
    # (utils.py:3173) — href is pruned.
    assert "href" not in preprocess_html_for_schema(PAGE)


def test_preprocess_truncates_long_text():
    red = preprocess_html_for_schema(PAGE)
    assert ("long text " * 30) not in red
    # stripped prefix + '...' (utils.py:3189-3191)
    assert ("long text " * 30).strip()[:100] + "..." in red


def test_preprocess_attr_value_truncation():
    html = f'<html><body><div class="c" id="{"x" * 250}">t</div></body></html>'
    red = preprocess_html_for_schema(html)
    assert 'id="' + "x" * 200 + '..."' in red


def test_preprocess_dedups_identical_classed_blocks():
    # append an exact copy of the second card — the copy must be dropped
    card2 = ('<div class="item card" data-sku="s2"><h3 class="title">Item B</h3>'
             '<span class="price">$2.00</span><a href="/b">view</a></div>')
    red = preprocess_html_for_schema(PAGE.replace("</body>", card2 + "</body>"))
    assert red.count('data-sku="s2"') == 1
    # distinct cards both survive
    assert red.count('data-sku="s1"') == 1


def test_preprocess_max_size_cap():
    big = "<html><body>" + ('<div class="a">t</div>' if False else "z" * 50) + "</body></html>"
    out = preprocess_html_for_schema(big, max_size=20)
    assert out.endswith("...") and len(out) == 23


def test_optimize_html_truncates_attrs_and_text():
    html = f'<html><body><p class="{"c" * 300}">{"t" * 300}</p></body></html>'
    out = optimize_html(html, threshold=200)
    assert 'class="' + "c" * 200 + '..."' in out
    assert ">" + "t" * 200 + "...<" in out


def test_optimize_html_short_values_untouched():
    html = '<html><body><p class="c">short</p></body></html>'
    assert "short" in optimize_html(html) and 'class="c"' in optimize_html(html)


# ---------------------------------------------------------------------------
# Prompt assembly: three-variant reminder structure
# ---------------------------------------------------------------------------

def test_prompt_variants():
    p_neither = build_schema_prompt("<p>x</p>")
    p_query = build_schema_prompt("<p>x</p>", query="products")
    p_example = build_schema_prompt("<p>x</p>", target_json_example='{"a":1}')
    p_both = build_schema_prompt("<p>x</p>", query="q", target_json_example='{"a":1}')
    assert "```html\n<p>x</p>\n```" in p_neither
    assert "no query and no example" in p_neither
    assert "no example object is given" in p_query and "## Goal description" in p_query
    assert "match the provided example" in p_example and "```json" in p_example
    # both present → no reminder variant (reference's if/elif chain)
    for marker in ("no example object is given", "match the provided example", "no query and no example"):
        assert marker not in p_both
    assert "XPath" in build_schema_prompt("<p>x</p>", schema_type="XPATH")
    assert "XPath" not in build_schema_prompt("<p>x</p>", schema_type="CSS")


def test_generate_schema_failure_wrap():
    with pytest.raises(Exception, match="Failed to generate schema"):
        generate_schema("<p>x</p>", completion_fn=lambda p: "not json {")


# ---------------------------------------------------------------------------
# Deterministic inducer closes the generate→extract loop
# ---------------------------------------------------------------------------

def test_induce_and_extract_roundtrip():
    red = preprocess_html_for_schema(PAGE)
    schema = induce_css_schema(red)
    assert schema["baseSelector"] == "div.item.card"
    assert {f["name"] for f in schema["fields"]} == {"title", "price"}
    assert schema["baseFields"] == [{"name": "data_sku", "type": "attribute", "attribute": "data-sku"}]
    items = extract_json_css(PAGE, schema)
    assert len(items) == 2
    assert items[0]["title"] == "Item A" and items[1]["price"] == "$2.00"
    assert items[0]["data_sku"] == "s1"


def test_induce_returns_none_without_repetition():
    assert induce_css_schema("<html><body><p class='solo'>x</p></body></html>") is None
    assert induce_css_schema("<html><body><p>x</p><p>y</p></body></html>") is None


def test_generate_schema_default_completion():
    schema = generate_schema(preprocess_html_for_schema(PAGE))
    assert schema["baseSelector"] == "div.item.card"


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def test_preprocess_pages_operator(spark):
    df = spark.createDataFrame([("u1", PAGE)], ["url", "html"])
    row = preprocess_pages(df).collect()[0]
    assert row["reduced_html"] == preprocess_html_for_schema(PAGE)
    assert row["reduced_len"] == len(row["reduced_html"])
    assert row["optimized_len"] == len(optimize_html(PAGE))


def test_generate_schemas_operator(spark):
    df = spark.createDataFrame([("u1", PAGE), ("u2", "<p>no pattern</p>")], ["url", "html"])
    rows = {r["url"]: r for r in generate_schemas(df).collect()}
    assert rows["u1"]["n_items"] == 2
    assert json.loads(rows["u1"]["schema_json"])["baseSelector"] == "div.item.card"
    assert rows["u2"]["schema_json"] == "null" and rows["u2"]["n_items"] == 0
    assert rows["u1"]["error"] is None


def test_operator_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("u1", PAGE)], ["url", "html"])
    plan = preprocess_pages(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# example-guided induction + the Google-search crawler graft (operators/serp.py,
# reference crawlers/google_search/crawler.py:59-131)
# ---------------------------------------------------------------------------

SERP = (
    '<html><head><title>q</title></head><body><div id="search">'
    + "".join(
        f'<div class="g"><h3 class="title">R{i}</h3><a href="/r{i}">go</a>'
        f'<div class="snippet">Snip {i}</div><span class="date">o{i} hrs</span></div>'
        for i in range(3)
    )
    + '</div><div id="top-stories">'
    + "".join(
        f'<div class="story"><div class="title">S{i}</div><a href="/s{i}">x</a>'
        f'<span class="source">Src{i}</span><span class="date">t{i} hrs</span></div>'
        for i in range(2)
    )
    + '</div><div id="also-search">'
    '<div class="suggestion"><span class="query">alpha</span></div>'
    '<div class="suggestion"><span class="query">beta</span></div>'
    "</div></body></html>"
)


def test_example_guided_induction_picks_matching_container():
    from crawl4ai_spark.operators.schema_gen import induce_css_schema_matching

    # top-stories keys pick div.story (3 key overlap) over the MORE
    # repeated div.g (2) — the example steers, repetition only tie-breaks
    s = induce_css_schema_matching(SERP, ["title", "link", "source", "date"])
    assert s["baseSelector"] == "div.story"
    s = induce_css_schema_matching(SERP, ["title", "link", "snippet", "date"])
    assert s["baseSelector"] == "div.g"
    s = induce_css_schema_matching(SERP, ["query"])
    assert s["baseSelector"] == "div.suggestion"
    # nothing overlaps -> falls back to most-repeated
    s = induce_css_schema_matching(SERP, ["nonexistent"])
    assert s["baseSelector"] == "div.g"


def test_build_serp_schemas_caches_and_sections():
    from crawl4ai_spark.operators.serp import build_serp_schemas

    cache = {}
    schemas = build_serp_schemas(SERP, cache=cache)
    assert set(schemas) == {"organic_schema", "top_stories_schema", "suggested_query_schema"}
    assert schemas["organic_schema"]["baseSelector"] == "div.g"
    assert schemas["top_stories_schema"]["baseSelector"] == "div.story"
    assert schemas["suggested_query_schema"]["baseSelector"] == "div.suggestion"
    # second call must reuse the cache objects (reference's file cache analog)
    again = build_serp_schemas("<p>different page</p>", cache=cache)
    assert again["organic_schema"] is schemas["organic_schema"]


def test_serp_extract_distributed(spark):
    from crawl4ai_spark.operators.serp import build_serp_schemas, serp_extract

    schemas = build_serp_schemas(SERP)
    pages = spark.createDataFrame([("u1", SERP), ("u2", "<p>empty</p>")], ["url", "html"])
    rows = serp_extract(pages, schemas).collect()
    by = {}
    for r in rows:
        by.setdefault((r["src_url"], r["section"]), []).append(r)
    assert len(by[("u1", "organic_schema")]) == 3
    assert len(by[("u1", "top_stories_schema")]) == 2
    assert [json.loads(r["item_json"])["query"]
            for r in sorted(by[("u1", "suggested_query_schema")], key=lambda r: r["item_idx"])] == ["alpha", "beta"]
    assert json.loads(by[("u1", "organic_schema")][0]["item_json"]) == {
        "title": "R0", "snippet": "Snip 0", "date": "o0 hrs"}
    assert ("u2", "organic_schema") not in by  # no matches, no rows

    plan = serp_extract(pages, schemas)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one stateless pass, all sections fused
