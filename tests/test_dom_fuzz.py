"""Robustness fuzz: the stdlib DOM, markdown converter, and content
filters must never crash on arbitrary (malformed) HTML — web-scale input
is adversarial by default."""

from hypothesis import given, settings, strategies as st

from crawl4ai_spark.functions.dom import css_select, ensure_body, parse_dom
from crawl4ai_spark.functions.markdown import (
    convert_links_to_citations,
    generate_markdown,
    html_to_markdown,
)
from crawl4ai_spark.operators.content_filter import (
    bm25_filter_content,
    pruning_filter_content,
)
from crawl4ai_spark.operators.extraction import extract_json_css

_TAGS = ["div", "p", "a", "span", "li", "ul", "table", "tr", "td", "h1", "b", "pre", "img", "br"]

_fragment = st.recursive(
    st.text(max_size=30),
    lambda children: st.builds(
        lambda tag, attrs, kids: "<%s%s>%s</%s>" % (tag, attrs, "".join(kids), tag),
        st.sampled_from(_TAGS),
        st.sampled_from(["", ' class="x y"', ' href="/a?b=1#c"', ' id="i"', ' colspan="zz"']),
        st.lists(children, max_size=4),
    ),
    max_leaves=20,
)

# deliberately broken html: unclosed tags, stray closers, entities, nulls
_broken = st.text(
    alphabet=st.sampled_from(list("<>/ab c=\"'&;!-x\n\t")), max_size=200
)


@settings(max_examples=60, deadline=None)
@given(st.one_of(_fragment, _broken))
def test_dom_and_markdown_never_crash(html):
    root = parse_dom(html)
    body = ensure_body(root)
    body.get_text(strip=True)
    root.inner_html()
    css_select(root, "div.x, a[href], li:nth-child(2), table > tr td")
    md = html_to_markdown(html)
    assert isinstance(md, str)
    conv, refs = convert_links_to_citations(md, "https://base.example.com/p")
    assert isinstance(conv, str) and isinstance(refs, str)
    generate_markdown(html, base_url="https://b.com", content_filter=None)


@settings(max_examples=40, deadline=None)
@given(st.one_of(_fragment, _broken))
def test_content_filters_never_crash(html):
    assert isinstance(pruning_filter_content(html), list)
    assert isinstance(bm25_filter_content(html, user_query="alpha beta"), list)


@settings(max_examples=40, deadline=None)
@given(st.one_of(_fragment, _broken))
def test_json_css_never_crashes(html):
    schema = {
        "baseSelector": "div.x",
        "fields": [
            {"name": "t", "type": "text", "selector": "a"},
            {"name": "h", "type": "attribute", "selector": "a", "attribute": "href"},
            {"name": "lst", "type": "list", "selector": "li",
             "fields": [{"name": "v", "type": "text"}]},
        ],
    }
    items = extract_json_css(html, schema)
    assert isinstance(items, list)


def test_markdown_no_links_is_identity():
    md = "# Title\nplain paragraph with no links\n* item"
    conv, refs = convert_links_to_citations(md, "https://b.com")
    assert conv == md
    assert refs == "\n\n## References\n\n"


@settings(max_examples=40, deadline=None)
@given(st.one_of(_fragment, _broken))
def test_parse_head_never_crashes(html):
    from crawl4ai_spark.functions.heads import parse_head

    h = parse_head(html)
    assert isinstance(h, dict) and set(h) == {"title", "charset", "meta", "link", "jsonld", "lang"}
