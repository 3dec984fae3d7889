"""Page-metadata + prettify graft tests (reference: utils.py
extract_metadata_using_lxml / fast_format_html; consumed at
content_scraping_strategy.py:690 and async_webcrawler.py:739).

``fast_format_html`` is pure and IS cross-executed against the reference's
own extracted code.  ``extract_metadata_using_lxml`` needs lxml (absent),
so its rules are pinned by hand-built expectations, quirks included.
"""

import json

from reference_loader import load_defs

from crawl4ai_spark.operators.scrape import (
    extract_page_metadata,
    fast_format_html,
    page_metadata_lxml,
)


# ---------------------------------------------------------------------------
# fast_format_html — full xcheck
# ---------------------------------------------------------------------------

FORMAT_CASES = [
    "",
    "plain text",
    "<div><p>hi</p></div>",
    "<div><p>hi</p><br/></div>",
    "<ul><li>a</li><li>b</li></ul>",
    "<div>text <b>bold</b> tail</div>",
    '<div class="x"><span>nested <i>deep</i></span></div>',
    "<p>unclosed",
    "</p>stray close",
    "<a href='/x'>link</a> after",
    "<div>\n\n  spaced\n</div>",
]


def test_fast_format_html_xcheck():
    ref = load_defs("utils.py", ["fast_format_html"])["fast_format_html"]
    for case in FORMAT_CASES:
        assert fast_format_html(case) == ref(case), repr(case)


# ---------------------------------------------------------------------------
# extract_metadata_using_lxml — pinned rules
# ---------------------------------------------------------------------------

def test_metadata_basic_fields():
    md = page_metadata_lxml(
        '<html><head><title>  T  </title><meta name="description" content=" d ">'
        '<meta name="keywords" content="a,b"><meta name="author" content="me">'
        "</head><body></body></html>"
    )
    assert md["title"] == "T" and md["description"] == "d"
    assert md["keywords"] == "a,b" and md["author"] == "me"


def test_metadata_no_head_returns_empty():
    # quirk: no <head> element → {} immediately, even with a body <title>
    assert page_metadata_lxml("<html><body><title>BT</title></body></html>") == {}
    assert page_metadata_lxml("") == {}


def test_metadata_title_fallback_chain():
    # head without <title>, body <title> → whole-document find() fallback
    md = page_metadata_lxml(
        "<html><head></head><body><title>BT</title></body></html>"
    )
    assert md["title"] == "BT"
    # empty head <title> shadows the body one (doc.find returns it first),
    # so the chain falls through to og:title
    md = page_metadata_lxml(
        '<html><head><title></title><meta property="og:title" content="OG">'
        "</head><body><title>BT2</title></body></html>"
    )
    assert md["title"] == "OG"
    # og:title with empty content → None
    md = page_metadata_lxml(
        '<html><head><title></title><meta property="og:title" content=""></head></html>'
    )
    assert md["title"] is None


def test_metadata_prefixed_maps():
    md = page_metadata_lxml(
        '<html><head><title>t</title>'
        '<meta property="og:image" content="/i.png">'
        '<meta name="twitter:card" content="summary">'
        '<meta property="article:tag" content="">'  # dropped: empty content
        '<meta property="og:type" content=" article ">'  # stripped
        "</head></html>"
    )
    assert md["og:image"] == "/i.png" and md["twitter:card"] == "summary"
    assert md["og:type"] == "article"
    assert "article:tag" not in md


def test_metadata_duplicate_overwrites():
    md = page_metadata_lxml(
        '<html><head><title>t</title>'
        '<meta property="og:image" content="/first.png">'
        '<meta property="og:image" content="/second.png"></head></html>'
    )
    assert md["og:image"] == "/second.png"


def test_extract_page_metadata_operator(spark):
    html = (
        '<html><head><title>T</title><meta name="description" content="d">'
        '<meta property="og:image" content="/i.png"></head></html>'
    )
    df = spark.createDataFrame([("u1", html), ("u2", "<html><body>no head</body></html>")], ["url", "html"])
    rows = {r["src_url"]: r for r in extract_page_metadata(df).collect()}
    assert rows["u1"]["title"] == "T"
    assert json.loads(rows["u1"]["metadata_json"]) == {"og:image": "/i.png"}
    assert rows["u2"]["title"] is None and rows["u2"]["metadata_json"] == "{}"
